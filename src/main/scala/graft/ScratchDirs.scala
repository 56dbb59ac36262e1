package graft

import java.nio.file.{Files, Path}

/**
 * Per-JVM scratch directories with RECURSIVE cleanup on exit.
 * `File.deleteOnExit` only removes empty directories, so every layout
 * query that writes a dataset copy (bucketed/partitioned/clustered/format
 * round-trips) would otherwise leak a copy per invocation — bench runs
 * each query twice (warmup + timed) and an iteration loop of repeated
 * runs fills /tmp. All scratch dirs live under one root that a shutdown
 * hook deletes bottom-up.
 */
object ScratchDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the self-cleaning root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized scratch DATASET: `build` runs once per `key` per JVM and the
    * directory is reused by every later caller with the same key. For the
    * staged-input pattern (streaming queries re-writing a source table as
    * N file drops): Verify/Bench run each such query repeatedly in one
    * JVM, and at rehearsal scales a staged copy is multi-GB — without
    * memoization each invocation re-writes it. Keys must encode every
    * input that determines the dataset (source dir, projection, layout). */
  def cached(key: String)(build: String => Unit): String =
    built.computeIfAbsent(key, { _ =>
      // hand the builder a NOT-YET-EXISTING child path: dataset writers
      // (parquet etc.) refuse an existing directory without overwrite mode
      val d = dir(key.replaceAll("[^A-Za-z0-9_.-]", "_").take(60)) + "/data"
      build(d)
      d
    })

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(c => deleteRecursively(c)) finally s.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Throwable => () }
  }
}
