package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Ann

/** Dev scratch: wall-clock phase breakdown of the persisted IVF+PQ
  * build + append + compact + serve chain (the ann_index_compact
  * anatomy) at bench conditions. */
object AnnPhases {
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
    // warmup
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val NC = 10; val LLOYD = 2; val PQ_M = 4; val PQ_K = 8
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val all = e.select(col("vec_id"), col("embedding").as("ce"))
      val base = all.filter(col("vec_id") % 7 =!= 0)
      val fresh = all.filter(col("vec_id") % 7 === 0)
      val idx = graft.core.Scratch.dir("graft_rt").resolve("ann_phase_probe").toString
      val cent = t("ivfCentroids") { Ann.ivfCentroids(base, NC, LLOYD) }
      t("write centroids") { cent.coalesce(1).write.mode("overwrite").parquet(s"$idx/centroids") }
      val res = Ann.ivfResiduals(base, cent)
      val rv = res.select(col("vec_id"), col("re").as("ce"))
      val cb = t("pqCodebooks") { Ann.pqCodebooks(rv, PQ_M, PQ_K, LLOYD, "ivfpq") }
      t("write codebooks") { cb.coalesce(1).write.mode("overwrite").parquet(s"$idx/codebooks") }
      val enc = Ann.pqEncode(rv, cb)
        .join(res.select(col("vec_id"), col("bucket")), Seq("vec_id"))
        .select(col("vec_id"), col("bucket"), col("codes"))
      t("encode+writeIndexed") { graft.ops.FileIndex.writeIndexed(enc, s"$idx/encoded", "bucket", 4) }
      t("fingerprint") {
        base.agg(count(lit(1)).as("n_vectors"),
          coalesce(expr("bit_xor(xxhash64(vec_id, ce))"), lit(0L)).as("checksum"))
          .coalesce(1).write.mode("overwrite").parquet(s"$idx/fingerprint")
      }
      t("appendIndexPq") { Ann.appendIndexPq(fresh, idx, files = 2) }
      t("compactIndexPq") { Ann.compactIndexPq(spark, idx, files = 4) }
      t("verifyIndex") { Ann.verifyIndex(spark, idx, all) }
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      t("serve ivfpqTopKPersisted") {
        Ann.ivfpqTopKPersisted(spark, q, idx, 10, 2)
          .select("qid", "vec_id", "dot_x1e6", "rank").orderBy("qid", "rank")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
