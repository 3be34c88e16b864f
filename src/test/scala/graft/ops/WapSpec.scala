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

  test("optimistic commit race: exactly ONE of two concurrent stagers promotes") {
    val table = java.nio.file.Files.createTempDirectory("wap_cas").toString
    val a = Wap.stage(Seq((1L, "A")).toDF("k", "who"), table, "writerA")
    val b = Wap.stage(Seq((2L, "B")).toDF("k", "who"), table, "writerB")
    // both writers observed the same head before either committed
    val v0 = Wap.currentVersion(table)
    assert(v0 == 0L)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val results = Seq(a, b).map { path =>
      pool.submit(new java.util.concurrent.Callable[Either[Wap.Conflict, Long]] {
        def call() = {
          gate.await()
          try Right(Wap.tryPublish(table, v0, path))
          catch { case c: Wap.Conflict => Left(c) }
        }
      })
    }
    gate.countDown()
    val outcomes = results.map(_.get(30, TimeUnit.SECONDS))
    pool.shutdown()
    val (losers, winners) = outcomes.partition(_.isLeft)
    assert(winners.size == 1 && losers.size == 1,
      s"expected exactly one winner, got $outcomes")
    assert(winners.head.toOption.get == 1L)
    assert(Wap.currentVersion(table) == 1L)
    // the loser rebases on the new head and succeeds at v2
    val loserPath = if (Wap.publishedPath(table).get == a) b else a
    assert(Wap.publishWithRetry(table, loserPath) == 2L)
    assert(Wap.publishedPath(table).get == loserPath)
    // readers only ever see a fully-published snapshot
    val snap = Wap.readPublished(spark, table).collect()
    assert(snap.length == 1)
  }

  test("a claimed-but-unpublished lock keeps the previous snapshot live; retry is bounded") {
    val table = java.nio.file.Files.createTempDirectory("wap_lock").toString
    val p1 = Wap.stage(Seq((1L, "x")).toDF("k", "v"), table, "w1")
    assert(Wap.tryPublish(table, 0L, p1) == 1L)
    // simulate a writer that claimed v2 and crashed before the manifest
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(table).resolve("_commits").resolve("v2.lock"))
    assert(Wap.currentVersion(table) == 1L) // still the old head
    assert(Wap.readPublished(spark, table).count() == 1L)
    val p2 = Wap.stage(Seq((2L, "y")).toDF("k", "v"), table, "w2")
    val c = intercept[Wap.Conflict](Wap.publishWithRetry(table, p2, maxAttempts = 3))
    assert(c.actual >= 2L) // surfaced, not spun forever
  }
}
