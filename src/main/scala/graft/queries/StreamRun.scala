package graft.queries

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.SparkSession

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
}
