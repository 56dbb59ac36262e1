package graft.streaming

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * transformWithState (Spark 4 arbitrary-state API): the per-user
 * MapState[event_type → count] processor, replayed through real
 * micro-batches on the RocksDB state store, must converge to the batch
 * GROUP BY — cross-batch MapState survival is exactly what's under test.
 */
class TwsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_stream_tws matches the batch group-by (MapState across micro-batches)") {
    val streamed = SparkEntry.queries("q_stream_tws")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // provider conf restored after the query (HDFS-backed default kept)
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
  }
}
