package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Dev scratch: sub-phase breakdown of prefixFilterPairs. */
object PrefixPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-32s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.expressions.Window
    val tauX1e4 = 8000L; val maxBucket = 10000L

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val corpus = d.select(col("doc_id").as("id"), col("text"))
        .unionAll(d.select((col("doc_id") + 1000000).as("id"),
          when(col("doc_id") % 50 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" zzz9"))).as("text")))
      val sh = Dedup.shingles(corpus, "id", "text", n = 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("materialize 5-gram shingles") { noop(sh) }
      println("  shingle rows: " + sh.count())
      val freq = sh.groupBy("sh").agg(count(lit(1)).as("tf"))
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
      val ranked = sh.join(freq, "sh")
        .withColumn("pos", row_number().over(
          Window.partitionBy("id").orderBy(col("tf"), col("sh"))))
      val pref = ranked.join(sizes, "id")
        .filter(col("pos") <=
          col("n") - floor((col("n") * tauX1e4 + 9999L) / 10000L) + 1L)
        .select("id", "sh")
      t("freq+rank+prefix") { noop(pref) }
      val okKeys = pref.groupBy("sh").agg(count(lit(1)).as("pn"))
        .filter(col("pn") <= maxBucket).select("sh")
      val capped = pref.join(okKeys, Seq("sh"))
      val cand = capped.as("x").join(capped.as("y"),
          col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      t("cap+selfjoin+distinct") { noop(cand) }
      println("  cand rows: " + cand.count())
      t("jaccard verify+filter") {
        noop(Dedup.jaccard(cand, sh).filter(col("jacc_x1e4") >= tauX1e4)) }
      sh.unpersist(blocking = true)
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
