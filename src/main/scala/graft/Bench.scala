package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main. Prints ONE JSON line with per-query wall-clock seconds at
 * `SPARK_GRAFT_SF_DIR`.
 *
 * Before timing, every query runs once against sf0.001 (when present): this
 * warms JVM/JIT, Parquet footer readers, and whole-stage codegen compilation
 * so the timed numbers measure the ENGINE, not first-query classloading —
 * round 1 attributed ~11 s of one-time session warmup to whichever query the
 * map iterated first.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink: forces FULL materialization of every output column (a bare
    // count() lets Catalyst prune expensive projections, under-reporting),
    // without paying for an actual write
    def exercise(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try exercise(fn, warmDir) catch { case _: Throwable => () }
      }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try exercise(fn, sfDir) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
