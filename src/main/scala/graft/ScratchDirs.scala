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
