package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GoldenSpec extends SparkSpec {
  import spark.implicits._

  test("pickByPriority: lowest priority wins; null values never win") {
    val df = Seq(
      ("c1", 2L, Some("crm_name"), 500L),
      ("c1", 1L, None, 900L),           // best priority but null name
      ("c1", 3L, Some("scrape_name"), 100L),
      ("c2", 5L, Some("only"), 7L))
      .toDF("cluster", "prio", "name", "bal")
    val got = df.groupBy("cluster")
      .agg(Golden.pickByPriority(col("prio"), col("name")).as("n"),
        max(col("bal")).as("b"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("c1", "crm_name", 900L), ("c2", "only", 7L)))
  }

  test("pickByPriority: all-null field yields null, not a crash") {
    val df = Seq(("c", 1L, Option.empty[String])).toDF("cluster", "prio", "name")
    val got = df.groupBy("cluster")
      .agg(Golden.pickByPriority(col("prio"), col("name")).as("n"))
      .collect()
    assert(got.length == 1 && got(0).isNullAt(1))
  }
}
