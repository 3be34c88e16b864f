package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-Audit-Publish with MULTI-WRITER optimistic concurrency.
  *
  * The single-writer `wap_publish` gate promotes by directory rename;
  * with several concurrent stagers that rename is a race. This module
  * is the table-format commit protocol in miniature: each writer
  * STAGES its candidate under a unique token, audits the staged files,
  * and PUBLISHES with a compare-and-swap on the commit version — the
  * atomic `Files.createFile` of `_commits/v<N+1>.lock` succeeds for
  * exactly one writer per version (O_EXCL is the CAS primitive; at
  * cluster scale the same conditional-put runs against a metastore or
  * object-store if-none-match). The winner then records its manifest
  * as `v<N+1>.json`; every loser gets a [[Wap.Conflict]] carrying the
  * observed version and rebases + retries at the new head — the same
  * versioned exactly-once discipline as the streaming state store
  * (streaming/EventsStream.scala `mergeBatchIntoState`: read strictly
  * below, write your own version, never overwrite what you read).
  *
  * Readers resolve the MAX version with a manifest present and read
  * only its recorded data path: a crashed writer that claimed a lock
  * but never wrote the manifest is simply not yet published — no torn
  * reads, and the previous snapshot stays live throughout.
  */
object Wap {

  /** Optimistic-commit failure: someone else published `actual` while
    * this writer expected to install on top of `expected`. */
  final case class Conflict(expected: Long, actual: Long)
    extends RuntimeException(
      s"wap: optimistic commit conflict — expected version $expected, head is $actual")

  private def commitsDir(tableDir: String): Path = {
    val d = Paths.get(tableDir).resolve("_commits")
    Files.createDirectories(d)
    d
  }

  /** Highest PUBLISHED version (manifest present), 0 = empty table. */
  def currentVersion(tableDir: String): Long = {
    val listing = Files.list(commitsDir(tableDir))
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toLong }
        .foldLeft(0L)(math.max)
    } finally listing.close()
  }

  /** Data path of the current snapshot, None before the first commit. */
  def publishedPath(tableDir: String): Option[String] = {
    val v = currentVersion(tableDir)
    if (v == 0L) None
    else {
      val f = commitsDir(tableDir).resolve(s"v$v.json")
      Some(new String(Files.readAllBytes(f), UTF_8).trim)
    }
  }

  /** The current snapshot as a DataFrame (the only path readers take). */
  def readPublished(spark: SparkSession, tableDir: String): DataFrame =
    publishedPath(tableDir) match {
      case Some(p) => spark.read.parquet(p)
      case None => throw new IllegalStateException(
        s"wap: no published version at $tableDir")
    }

  /** Stage a candidate under this writer's token. Pure data write —
    * no coordination, any number of writers stage concurrently. */
  def stage(df: DataFrame, tableDir: String, token: String): String = {
    val p = Paths.get(tableDir).resolve(s"data-$token")
    df.write.mode("overwrite").parquet(p.toString)
    p.toString
  }

  /** CAS publish: install `dataPath` as version `expected + 1`, or
    * throw [[Conflict]] if another writer claimed that version first.
    * The lock create is the atomic point; the manifest then lands via
    * write-to-temp + atomic rename on a name only the lock winner
    * uses, so readers can never observe a half-written manifest. */
  def tryPublish(tableDir: String, expected: Long, dataPath: String): Long = {
    val d = commitsDir(tableDir)
    val next = expected + 1
    try Files.createFile(d.resolve(s"v$next.lock"))
    catch {
      case _: FileAlreadyExistsException =>
        throw Conflict(expected, math.max(currentVersion(tableDir), next))
    }
    val tmp = d.resolve(s".v$next.json.tmp")
    Files.write(tmp, dataPath.getBytes(UTF_8))
    Files.move(tmp, d.resolve(s"v$next.json"), StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Optimistic-retry publish: re-read the head and re-CAS until one
    * attempt wins (bounded). Correct for candidates whose content does
    * not depend on the snapshot they land on (full-replacement or
    * blind-append promotion); a read-modify-write candidate must
    * re-derive from the new head between attempts instead. */
  def publishWithRetry(tableDir: String, dataPath: String,
      maxAttempts: Int = 5): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return tryPublish(tableDir, currentVersion(tableDir), dataPath)
      catch { case c: Conflict => if (attempt >= maxAttempts) throw c }
    }
    0L // unreachable
  }
}
