package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * DataFrame-operator semantics of the offset log, against the same scenarios
 * the reference pins in `cmd/server/server_test.go` (truncated log 10..19
 * from 20 writes / segment 5; page clamps; replay windows).
 */
class EventLogOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A log holding offsets [lo, hi] — the post-truncation view. */
  private def log(lo: Long, hi: Long): DataFrame =
    (lo to hi).map(i => (i, s"payload-$i")).toDF("offset", "body")

  private def offsets(df: DataFrame): Seq[Long] =
    df.select("offset").collect().map(_.getLong(0)).toSeq

  test("range = {earliest, latest} (O7; server_test.go:42-59)") {
    val r = EventLog.range(log(0, 4)).head()
    assert((r.getLong(0), r.getLong(1)) === ((0L, 4L)))
    val truncated = EventLog.range(log(10, 19)).head()
    assert((truncated.getLong(0), truncated.getLong(1)) === ((10L, 19L)))
  }

  test("pointLookup returns exactly the addressed record (O8)") {
    assert(offsets(EventLog.pointLookup(log(10, 19), 11)) === Seq(11L))
    // purged / future offsets simply match nothing at the DataFrame layer;
    // the API layer maps them to 400s via checkOffset
    assert(offsets(EventLog.pointLookup(log(10, 19), 3)) === Seq.empty)
    assert(offsets(EventLog.pointLookup(log(10, 19), 25)) === Seq.empty)
  }

  test("lastPage returns last ≤pageSize ascending (O9; getStart clamps)") {
    // earliest 0, latest 100, page 50 => start 51 (server_test.go:448-455)
    assert(offsets(EventLog.lastPage(log(0, 100))) === (51L to 100L))
    // log smaller than a page: everything, ascending
    assert(offsets(EventLog.lastPage(log(0, 10))) === (0L to 10L))
    // truncated log, page 5
    assert(offsets(EventLog.lastPage(log(10, 19), pageSize = 5)) === (15L to 19L))
  }

  test("replayFrom streams ascending from start (O10 replay; server_test.go:361-370)") {
    // 15 records, segment 5 => log holds 5..14; replay from 10 => 10..14
    assert(offsets(EventLog.replayFrom(log(5, 14), 10)) === (10L to 14L))
    // replay from before earliest yields the whole retained window (API
    // layer raises OutOfRange first, per server_test.go:350-359)
    assert(EventLog.checkOffset(EventLog.LogRange(5, 14), 0) === Left(EventLog.OutOfRange))
  }

  test("retained keeps at most 2×segmentSize latest offsets (O6; server_test.go:52-59)") {
    // 20 writes, segment 5: full log 0..19, retained view 10..19
    assert(offsets(EventLog.retained(log(0, 19), segmentSize = 5, offsetCol = "offset")) === (10L to 19L))
    // NON-boundary latest: 21 writes → active=[20], history=15..19 — the
    // old `> latest − 2S` bound would wrongly keep 12..20 here
    assert(offsets(EventLog.retained(log(0, 20), segmentSize = 5, offsetCol = "offset")) === (15L to 20L))
  }

  test("retained batch view equals a real OffsetLog's snapshot at every fill level") {
    for (n <- Seq(1, 5, 6, 10, 11, 14, 15, 16)) {
      val ring = new graft.streaming.OffsetLog(0, 5)
      (0 until n).foreach(i => ring.write(Array(i.toByte)))
      val ringOffsets = ring.snapshot.map(_._1)
      val viewOffsets = offsets(EventLog.retained(log(0, n - 1), segmentSize = 5, offsetCol = "offset"))
      assert(viewOffsets === ringOffsets, s"divergence at n=$n")
    }
  }

  test("envelope carries CloudEvent attributes; serialized bytes exclude bookkeeping") {
    val ev = Seq((7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "login", 3L))
      .toDF("event_id", "ts", "event_type", "user_id")
    val env = EventLog.envelope(ev)
    val row = env.head()
    assert(row.getAs[String]("specversion") === "1.0")
    assert(row.getAs[String]("id") === "7")
    assert(row.getAs[String]("type") === "vmware.vsphere.login.v0")
    assert(row.getAs[String]("eventclass") === "event")
    val value = EventLog.serialized(env).select("value").head().getString(0)
    assert(!value.contains("\"offset\""))
    assert(value.startsWith("{\"specversion\":\"1.0\""))
  }

  test("oversized flags records whose canonical bytes exceed the cap (O5 guard)") {
    val small = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a", "x"))
      .toDF("event_id", "ts", "event_type", "payload")
    val big = Seq((2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a", "x" * 700000))
      .toDF("event_id", "ts", "event_type", "payload")
    val envSmall = EventLog.envelope(small)
    val envBig   = EventLog.envelope(big)
    assert(envSmall.filter(EventLog.oversized(envSmall)).count() === 0)
    assert(envBig.filter(EventLog.oversized(envBig)).count() === 1)
  }
}
