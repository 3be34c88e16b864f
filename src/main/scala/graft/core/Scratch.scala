package graft.core

import java.nio.file.{Files, Path}

/** Per-run scratch directories for pack queries that stage data on
  * local disk (bucketed tables, partitioned layouts, format
  * round-trip files).
  *
  * Fixed paths under `java.io.tmpdir` made concurrent harness runs on
  * one machine race on the same files and catalog table names, and
  * left debris behind. Every caller now gets a FRESH
  * `createTempDirectory` (the same isolation contract the streaming
  * gates use), plus a unique token for session-catalog table names.
  * Because most queries return a LAZY DataFrame over the staged files,
  * scratch can't be deleted inline — a single JVM shutdown hook sweeps
  * every directory this process created once the run is over. */
object Scratch {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach { d =>
        try {
          val walk = Files.walk(d)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
          finally walk.close()
        } catch { case _: Throwable => } // best-effort sweep at exit
      }
    }, "graft-scratch-sweep"))

  /** Fresh scratch directory, swept at JVM exit. */
  def dir(prefix: String): Path = {
    hookInstalled
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }

  /** Unique suffix for catalog table names (one per call). */
  def token(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)
}
