package graft

class GraftExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from spark.sql after register()") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT regexp_replace_first('aaa', 'a', 'b')")
      .head().getString(0) == "baa")
    assert(spark.sql("SELECT regexp_replace_first('x1y2', '(\\\\d)', '[$1]')")
      .head().getString(0) == "x[1]y2")
    assert(spark.sql(
      "SELECT array_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(4 AS DOUBLE), CAST(0.5 AS DOUBLE)))")
      .head().getDouble(0) == 7.0)
    assert(spark.sql("SELECT hilbert_key(3, 5), zorder_key(3, 5)").head().getLong(0)
      == graft.functions.HilbertOps.xy2d(3, 5))
  }

  test("cms_merge on the SQL surface: per-group sketches union to the single-shot build") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """WITH t(g, b0, b1, b2) AS (VALUES (0, 1L, 2L, 3L), (1, 1L, 2L, 3L), (0, 5L, 6L, 7L)),
        |shards AS (SELECT cms_build(b0, b1, b2, 64) AS sk FROM t GROUP BY g),
        |merged AS (SELECT cms_merge(sk, 64) AS sk FROM shards),
        |single AS (SELECT cms_build(b0, b1, b2, 64) AS sk FROM t)
        |SELECT cms_estimate(m.sk, 1L, 2L, 3L), m.sk = s.sk
        |FROM merged m, single s""".stripMargin).head()
    assert(row.getLong(0) == 2L)
    assert(row.getBoolean(1), "merged sketch must be bit-identical to single-shot build")
  }

  test("nfc_normalize collapses decomposed sequences; already-NFC text is identity") {
    GraftExtensions.register(spark)
    // Spark SQL chr() is mod-256, so the combining mark (U+0301) is
    // embedded via Scala escapes into the SQL text instead
    val composed = "Café"
    val decomposed = "Café"
    val out = spark.sql(
      s"SELECT nfc_normalize('$decomposed'), nfc_normalize('plain')").head()
    assert(out.getString(0) == composed)
    assert(out.getString(1) == "plain")
    // null propagates, and composed/decomposed meet at the same fixpoint
    assert(spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING))").head().isNullAt(0))
    assert(spark.sql(
      s"SELECT nfc_normalize('$composed') = nfc_normalize('$decomposed')")
      .head().getBoolean(0))
  }

  test("extensions class injects into a fresh session builder") {
    // SparkSessionExtensions instances apply cleanly (the actual
    // injection into a brand-new session needs a new JVM-level session;
    // here we verify the hook wires every function without error).
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
  }
}
