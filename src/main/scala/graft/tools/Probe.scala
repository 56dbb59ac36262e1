package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch probe: time selected declared queries, twice each, one JVM. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q_stream", "q_stream_dedup", "q_stream_window", "q_stream_hop")
    (1 to 2).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[probe] r$round $n%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
