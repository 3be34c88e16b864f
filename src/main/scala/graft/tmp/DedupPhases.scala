package graft.tmp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextAnalysis => TA}

/** Dev scratch: phase breakdown of the dedup/minhash and
  * curation_model_filter pipelines at bench conditions. */
object DedupPhases {
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

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val corpus = d.select(col("doc_id").as("id"), col("text"))
        .unionAll(d.select((col("doc_id") + 1000000).as("id"),
          when(col("doc_id") % 50 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" zzz9"))).as("text")))

      // dedup_minhash phases
      val sh = Dedup.shingles(corpus, "id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("minhash: shingles (materialize)") { noop(sh) }
      val sigs = Dedup.minhashSignatures(sh, 8)
      t("minhash: signatures") { noop(sigs) }
      val bands = Dedup.lshBands(sigs, 8, 4)
      val cand = Dedup.lshCandidates(bands, 10000L)
      t("minhash: bands+candidates") { noop(cand) }
      val pairs = Dedup.jaccard(cand, sh).filter(col("jacc_x1e4") >= 5000L)
      t("minhash: jaccard verify") { noop(pairs.orderBy("a", "b")) }
      sh.unpersist(blocking = true)

      // dedup_prefix_pairs phases (5-gram shingles)
      val sh5 = Dedup.shingles(corpus, "id", "text", n = 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("prefix: 5-gram shingles") { noop(sh5) }
      t("prefix: prefixFilterPairs") {
        noop(Dedup.prefixFilterPairs(sh5, 8000L).orderBy("a", "b")) }
      sh5.unpersist(blocking = true)

      // curation_model_filter phases
      val docs = d.select(col("doc_id"), col("lang"), col("text"))
      val lm = t("cmf: stupidBackoff build+score") {
        val x = TA.stupidBackoff(docs, "doc_id", "text", col("doc_id") % 10 =!= 0)
          .select(col("id").as("doc_id"), col("lm_bits_x100"))
        noop(x); x
      }
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy(col("lm_bits_x100"), col("doc_id"))
      val tiles = docs.select(col("doc_id"), col("lang")).join(lm, "doc_id")
        .withColumn("bucket",
          when(ntile(3).over(w) === 1, lit("head"))
            .when(ntile(3).over(w) === 2, lit("middle"))
            .otherwise(lit("tail")))
        .select("doc_id", "bucket")
      val labeled = tiles.filter(col("bucket") =!= "middle")
        .join(docs.select(col("doc_id"), col("text")), "doc_id")
        .withColumn("cls",
          when(col("bucket") === "head", lit("hi")).otherwise(lit("lo")))
      val model = t("cmf: nbTrain (eager)") { TA.nbTrain(labeled, "text", "cls") }
      t("cmf: nbScore+join+agg") {
        noop(TA.nbScore(docs, "doc_id", "text", model)
          .select(col("id").as("doc_id"), col("pred"))
          .join(tiles, "doc_id")
          .groupBy("bucket", "pred").agg(count(lit(1)).as("n_docs"))
          .orderBy("bucket", "pred"))
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
