package graft.queries

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared run plumbing for the streaming query replays — ONE copy, so a
  * future change to the restore semantics cannot leave the two streaming
  * modules with silently different behavior. */
private[queries] object StreamRun {

  /** Monotonic suffix for memory-sink table / checkpoint names; one counter
    * across all streaming modules so generated names can never collide. */
  val runId = new AtomicInteger(0)

  /** Stateful micro-batch queries pay per-partition state-store overhead on
    * EVERY batch; for these bounded replays a handful of state partitions
    * is right-sized (32 default = 4× the files/commit churn for no
    * parallelism win on ≤100k-event batches). The session's shuffle
    * partitioning is restored afterwards — batch queries keep their own
    * sizing. */
  def withStatePartitions[A](spark: SparkSession, n: Int)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Detach a drained memory-sink table from its MemoryPlan. A memory
    * sink's rows are embedded in the logical plan, so every downstream
    * stage re-ships them inside its serialized task binary — the session
    * sinks hold ~1M rows at the sf1 rehearsal (2+ MiB task warnings, ×
    * every stage). Re-shipping via TorrentBroadcast sends the snapshot
    * once per executor instead; rows materialize inside the tasks. Same
    * pattern as [[graft.streaming.Ingest.distributedRecords]], generalized
    * to any schema. Use for sink tables whose cardinality scales with the
    * input (sessions, per-key updates); a few-row sink gains nothing. */
  def detached(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows  = df.collect().toIndexedSeq
    val bc    = spark.sparkContext.broadcast(rows)
    val parts = math.max(1, math.min(rows.length / 8192 + 1, 32))
    spark.createDataFrame(
      spark.sparkContext
        .parallelize(0 until parts, parts)
        .flatMap { p =>
          val a  = bc.value
          val lo = (a.length.toLong * p / parts).toInt
          val hi = (a.length.toLong * (p + 1) / parts).toInt
          a.iterator.slice(lo, hi)
        },
      df.schema)
  }
}
