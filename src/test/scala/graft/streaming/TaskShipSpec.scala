package graft.streaming

import java.io.{ByteArrayOutputStream, ObjectOutputStream}

import graft.TestSpark
import graft.sources.{EventFeedPartition, LogCursor, LogTailPartition, OffsetLogRegistry}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the task-shipping contract of the streaming sources and log views:
 * row payloads move to executors ONCE via TorrentBroadcast (block
 * manager), so the objects that ride EVERY task — InputPartition
 * descriptors, the plan itself — stay small no matter how many records
 * the feed or log holds. This is the difference between a per-executor
 * transfer and a per-task one at scale (and what removed the ~4 MiB
 * `TaskSetManager`/`DAGScheduler` large-task warnings at sf0.1).
 */
class TaskShipSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def serializedSize(o: AnyRef): Int = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(o)
    oos.close()
    bos.size()
  }

  // descriptors must stay under a KB-scale bound however big the payload;
  // 64 KiB is ~2 orders of magnitude under the 1000 KiB warning threshold
  private val DescriptorBound = 64 * 1024

  test("LogTailPartition descriptor stays small for a 50k-record log") {
    spark.sparkContext // broadcasts need the shared session up
    val log = new OffsetLog(0, 100000)
    val payload = ("x" * 200).getBytes("UTF-8")
    (0 until 50000).foreach(_ => log.write(payload))
    OffsetLogRegistry.register("taskship_log", log)
    try {
      val stream = new graft.sources.LogTailMicroBatchStream(
        "taskship_log", startingOffset = Some(0L), maxBatchSize = 50000)
      val parts = stream.planInputPartitions(LogCursor(0L), LogCursor(50000L))
      assert(parts.length === 1)
      val sz = serializedSize(parts.head.asInstanceOf[LogTailPartition])
      assert(sz < DescriptorBound,
        s"LogTailPartition serialized to $sz bytes — rows are riding the task again")
    } finally OffsetLogRegistry.remove("taskship_log")
  }

  test("EventFeedPartition descriptor stays small for the whole sf0.01 feed") {
    spark.sparkContext
    val path = "/root/testdata/sf0.01/events.parquet"
    assume(new java.io.File(path).exists())
    val stream = new graft.sources.EventFeedMicroBatchStream(
      path, maxBatchSize = 1000000, startingTimestamp = None)
    stream.prepareForTriggerAvailableNow()
    val end = stream.reportLatestOffset()
    val parts = stream.planInputPartitions(graft.sources.FeedPosition(0L), end)
    assert(parts.length === 1)
    val sz = serializedSize(parts.head.asInstanceOf[EventFeedPartition])
    assert(sz < DescriptorBound,
      s"EventFeedPartition serialized to $sz bytes — rows are riding the task again")
  }

  test("logFrame plans a distributed scan, not a row-embedding LocalRelation") {
    val log = new OffsetLog(0, 100000)
    (0 until 20000).foreach(i => log.write(i.toString.getBytes("UTF-8")))
    val df = Ingest.logFrame(spark, log)
    val plan = df.queryExecution.optimizedPlan
    val hasLocalRelation = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty
    assert(!hasLocalRelation,
      "logFrame planted a LocalRelation — its rows would ship inside every task binary")
    assert(df.count() === 20000)
    // and it parallelizes: more than one partition for a 20k-record log
    assert(df.rdd.getNumPartitions > 1)
  }
}
