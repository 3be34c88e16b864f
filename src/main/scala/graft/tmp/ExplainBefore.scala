package graft.tmp

import org.apache.spark.sql.SparkSession

/** Dev scratch: capture .explain("formatted") for the optimization
  * round's target queries into plans/r20/<name>_before.txt, plus
  * wall-clock phase timings of the IVF+PQ index build. */
object ExplainBefore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val targets: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "ann_topk_pq", "ann_topk_ivfpq", "ann_topk_ivf",
        "ann_ivf_recall", "curation_model_filter", "dedup_prefix_pairs",
        "dedup_minhash", "dedup_simhash_banded", "dedup_cross_corpus",
        "text_winnow_fingerprints", "stats_poisson_bootstrap",
        "llm_pipeline_distill", "llm_pipeline_ccnet", "llm_pipeline_tokens",
        "dedup_exact_substring", "graph_triangles", "events_theil_sen",
        "dedup_blocking_metrics", "curation_ccnet_buckets", "dedup_minhash_cjk")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r20"))
    targets.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"plans/r20/${name}_$suffix.txt"), plan)
            println(f"[explain] $name ok (build ${(System.nanoTime()-t0)/1e9}%.1f s)")
          } catch { case e: Throwable =>
            println(s"[explain] $name FAILED: ${e.getMessage}")
          }
        case None => println(s"[explain] $name: no such query")
      }
    }
    spark.stop()
  }
}
