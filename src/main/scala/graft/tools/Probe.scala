package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch probe: time selected declared queries, twice each, one JVM.
  * With `--explain` as the first arg, dump each query's formatted physical
  * plan instead of timing it (the PLANS.md inspection loop). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val explain = args.headOption.contains("--explain")
    val names = {
      val ns = if (explain) args.drop(1).toSeq else args.toSeq
      if (ns.nonEmpty) ns
      else Seq("q_stream", "q_stream_dedup", "q_stream_window", "q_stream_hop")
    }
    if (explain) {
      names.foreach { n =>
        println(s"===== $n =====")
        println(SparkEntry.queries(n)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode))
      }
    } else {
      (1 to 2).foreach { round =>
        names.foreach { n =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
          println(f"[probe] r$round $n%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
      }
    }
    spark.stop()
  }
}
