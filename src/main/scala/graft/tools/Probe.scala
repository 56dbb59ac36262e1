package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch probe: dump formatted plans for selected declared queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val dir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q_tpch1", "q_join3", "q_page", "q_topk", "q_sim", "q_minhash_lsh", "q_asof")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
