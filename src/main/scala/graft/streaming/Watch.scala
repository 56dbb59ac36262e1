package graft.streaming

import graft.sources.{LogTailProvider, OffsetLogRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * EP1 — the watch/subscribe query surface (`?watch=true[&offset=N]`),
 * built on the [[graft.sources.LogTailMicroBatchStream]] source. A watch
 * is a Structured Streaming query over the live offset log; each
 * micro-batch delivers newly-appended records in offset order, and a
 * checkpointed restart resumes from the cursor (the reference client's
 * reconnect-with-offset pattern, `cmd/client/main.go:46-60`).
 */
object Watch {

  /** Register `log` under `name` and open a tail DataFrame over it. */
  def tail(
      spark: SparkSession,
      name: String,
      log: OffsetLog,
      startingOffset: Option[Long] = None,
      maxBatchSize: Int = 1000
  ): DataFrame = {
    OffsetLogRegistry.register(name, log)
    val r = spark.readStream
      .format(classOf[LogTailProvider].getName)
      .option("log", name)
      .option("maxBatchSize", maxBatchSize)
    startingOffset.foreach(o => r.option("startingOffset", o.toString))
    r.load()
  }
}
