package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Negative path for the Write-Audit-Publish gate: a candidate that
  * FAILS its audit must never be promoted — staging stays where it
  * is, the published path never appears, and the caller gets a
  * decisive error rather than a silently-bad table. */
class WapSpec extends SparkSpec {
  import spark.implicits._

  test("a failing audit blocks publication; staging is not promoted") {
    val base = java.nio.file.Files.createTempDirectory("wap_neg")
    val staging = base.resolve("staging")
    val published = base.resolve("published")
    // candidate with a duplicate key AND a bad status value
    Seq((1L, "O"), (1L, "O"), (2L, "X"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.parquet(staging.toString)
    val audit = Expectations.audit(spark.read.parquet(staging.toString), Seq(
      Expectations.inSet("o_orderstatus", Seq("O", "F", "P")),
      Expectations.Unique("unique:o_orderkey", Seq("o_orderkey"))))
    val nViolations = audit.agg(sum(col("n_violations"))).head.getLong(0)
    assert(nViolations == 2L, s"expected 2 violations, got $nViolations")
    // the promotion contract: only a clean audit moves staging
    if (nViolations == 0L) java.nio.file.Files.move(staging, published)
    assert(!java.nio.file.Files.exists(published))
    assert(java.nio.file.Files.exists(staging))
  }
}
