package graft.tmp

import org.apache.spark.sql.SparkSession

/** Dev scratch: wall-clock of representative streaming gates, with a
  * listener counting micro-batches, to find the fixed overhead. */
object StreamPhases {
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
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      t("events_hourly_stream") {
        graft.streaming.EventsStream.hourlyViaFileSink(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      t("events_sliding_stream") {
        graft.streaming.EventsStream.slidingViaFileSink(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
