package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.EventLog
import org.apache.spark.sql.functions._

/** Scratch probe for data/typing questions; not part of the library API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val ev    = Tables.events(spark, "/root/testdata/sf0.001")
    val env   = EventLog.envelope(ev)
    val v     = EventLog.serialized(env).select("value").first().getString(0)
    println("HAS_OFFSET_FIELD=" + v.contains("\"offset\""))
    println("FIELDS=" + v.take(140))
    println("EMPTY_INCONSISTENT=" + EventLog.LogRange(-1, 5).isEmpty)
    println("EMPTY_TRUE=" + EventLog.LogRange(-1, -1).isEmpty)
    val env2 = EventLog.envelope(
      ev, eventclass = when(col("event_type") === "error", "eventex").otherwise("event"))
    println("CLASSES=" + env2.select("eventclass").distinct()
      .collect().map(_.getString(0)).sorted.mkString(","))
    spark.stop()
  }
}
