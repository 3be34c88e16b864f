package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Ann

/** Dev scratch: the ann_topk_ivfpq INNER plan (before the cache-hygiene
  * localCheckpoint), to document the removed encode re-attach join. */
object IvfpqInnerPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val NC = 10; val LLOYD = 2; val PQ_M = 4; val PQ_K = 8
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val c = e.select(col("vec_id"), col("embedding").as("ce"))
    val cent = Ann.ivfCentroids(c, NC, LLOYD)
    val res = Ann.ivfResiduals(c, cent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = Ann.pqCodebooksCached(
      res.select(col("vec_id"), col("re").as("ce")), PQ_M, PQ_K, LLOYD,
      seed = "ivfpq")
    val enc = Ann.pqEncode(
        res.select(col("vec_id"), col("bucket"), col("re").as("ce")),
        cb, keep = Seq("bucket"))
      .select(col("vec_id"), col("bucket"), col("codes"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val inner = Ann.ivfpqTopK(q, cent, cb, enc, 10, 2)
      .select("qid", "vec_id", "dot_x1e6", "rank").orderBy("qid", "rank")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r20/ann_topk_ivfpq_after_inner.txt"),
      inner.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println("[inner] written; Exchange count = " +
      "Exchange".r.findAllIn(inner.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)).length)
    res.unpersist()
    spark.stop()
  }
}
