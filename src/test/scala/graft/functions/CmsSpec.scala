package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def termsDf(rows: Seq[String]) = rows.toDF("term")

  test("wide sketch with no collisions estimates exactly") {
    val data = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq.fill(1)("gamma")
    val w = 4096
    val df = termsDf(data)
    val Seq(b0, b1, b2) = Cms.buckets(col("term"), w)
    val sketch = df.agg(Cms.build(b0, b1, b2, w).as("cms"))
    val est = termsDf(Seq("alpha", "beta", "gamma", "absent"))
      .crossJoin(broadcast(sketch))
      .select(col("term"), Cms.estimate(col("cms"), b0, b1, b2).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") == 7 && est("beta") == 3 && est("gamma") == 1)
    // an unseen key can only collide upward from zero; with w=4096 and
    // 3 distinct seen terms a triple collision is impossible
    assert(est("absent") == 0)
  }

  test("sketch bytes are invariant to partitioning (merge = elementwise sum)") {
    val data = (1 to 500).map(i => s"t${i % 37}")
    val w = 64
    def sketchOf(parts: Int): Array[Byte] = {
      val df = termsDf(data).repartition(parts)
      val Seq(b0, b1, b2) = Cms.buckets(col("term"), w)
      df.agg(Cms.build(b0, b1, b2, w).as("cms")).head.getAs[Array[Byte]](0)
    }
    assert(sketchOf(1).toSeq == sketchOf(7).toSeq)
  }

  test("narrow sketch over-estimates but never under-estimates") {
    val data = (1 to 400).map(i => s"term${i % 50}") // 50 distinct, 8 each
    val w = 8 // heavy collisions guaranteed
    val df = termsDf(data)
    val Seq(b0, b1, b2) = Cms.buckets(col("term"), w)
    val sketch = df.agg(Cms.build(b0, b1, b2, w).as("cms"))
    val rows = df.distinct()
      .crossJoin(broadcast(sketch))
      .select(Cms.estimate(col("cms"), b0, b1, b2).as("n"))
      .collect().map(_.getLong(0))
    assert(rows.forall(_ >= 8), "CMS must never under-estimate")
    assert(rows.exists(_ > 8), "w=8 with 50 keys must collide somewhere")
  }

  test("null keys are skipped by the build and null out the estimate") {
    val w = 64
    val df = Seq(Some("a"), None, Some("a"), None).toDF("term")
    val Seq(b0, b1, b2) = Cms.buckets(col("term"), w)
    val sketch = df.agg(Cms.build(b0, b1, b2, w).as("cms"))
    val est = Seq("a").toDF("term").crossJoin(broadcast(sketch))
      .select(Cms.estimate(col("cms"), b0, b1, b2).as("n")).head.getLong(0)
    assert(est == 2) // the two null rows contributed nothing
    val nullEst = Seq(Option.empty[String]).toDF("term")
      .crossJoin(broadcast(sketch))
      .select(Cms.estimate(col("cms"), b0, b1, b2).as("n")).head
    assert(nullEst.isNullAt(0))
  }

  test("SQL surface: cms_build/cms_estimate, bloom_build/might_contain, array_dot_int8") {
    graft.GraftExtensions.register(spark)
    val data = Seq.fill(5)("x") ++ Seq.fill(2)("y")
    termsDf(data).selectExpr(
      "term",
      "CAST(pmod(conv(substring(md5(concat(term, ':cms0')), 1, 15), 16, 10), 512) AS LONG) AS b0",
      "CAST(pmod(conv(substring(md5(concat(term, ':cms1')), 1, 15), 16, 10), 512) AS LONG) AS b1",
      "CAST(pmod(conv(substring(md5(concat(term, ':cms2')), 1, 15), 16, 10), 512) AS LONG) AS b2")
      .createOrReplaceTempView("cms_t")
    val est = spark.sql(
      """WITH sk AS (SELECT cms_build(b0, b1, b2, 512) AS s FROM cms_t)
        |SELECT cms_estimate(sk.s, b0, b1, b2) AS n FROM cms_t JOIN sk
        |WHERE term = 'x' LIMIT 1""".stripMargin).head.getLong(0)
    assert(est == 5L)
    spark.range(100).selectExpr("id AS k").createOrReplaceTempView("bloom_t")
    val probes = spark.sql(
      """WITH f AS (SELECT bloom_build(k, 1024, 4) AS bf FROM bloom_t)
        |SELECT sum(CAST(bloom_might_contain(f.bf, k) AS INT)) FROM bloom_t JOIN f""".stripMargin)
      .head.getLong(0)
    assert(probes == 100L) // no false negatives, ever
    val d = spark.sql(
      "SELECT array_dot_int8(array(CAST(2 AS TINYINT), CAST(-3 AS TINYINT)), " +
        "array(CAST(5 AS TINYINT), CAST(7 AS TINYINT)))").head.getLong(0)
    assert(d == 2 * 5 + -3 * 7)
  }

  test("non-long bucket input fails analysis, not execution") {
    val df = Seq("x").toDF("term")
    val bad = col("term") // string, not a long bucket
    val ex = intercept[Exception] {
      df.agg(graft.functions.F.toColumn(
        CmsBuild(F.toExpr(bad), F.toExpr(bad), F.toExpr(bad), 16)
          .toAggregateExpression())).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"))
  }
}
