package graft.streaming

import graft.TestSpark
import graft.operators.EventLog.{FutureOffset, OutOfRange}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * OffsetLog semantics pinned by the reference's table tests
 * (`cmd/server/server_test.go`), plus the DSv2-source → sink e2e replay
 * (the Spark analog of the reference's vcsim e2e, `main_test.go:30-97`).
 */
class StreamingSpec extends AnyFunSuite {

  private def bytes(i: Int): Array[Byte] = i.toString.getBytes("UTF-8")

  private def filled(n: Int, seg: Int, start: Long = 0): OffsetLog = {
    val log = new OffsetLog(start, seg)
    (0 until n).foreach(i => log.write(bytes(i)))
    log
  }

  // --- Test_getRange vectors (server_test.go:23-92) ---
  test("range: empty log is (-1,-1); plain range; range after truncation") {
    assert(new OffsetLog(0, 10).range.isEmpty)
    val r5 = filled(5, 10).range
    assert((r5.earliest, r5.latest) === ((0L, 4L)))
    // 20 writes, segment 5 (current + history = 10) => {earliest:10, latest:19}
    val r20 = filled(20, 5).range
    assert((r20.earliest, r20.latest) === ((10L, 19L)))
  }

  // --- Test_getEvent vectors (server_test.go:94-209) ---
  test("read: error mapping and shifted-start logs") {
    // future offset on empty log
    assert(filled(0, 10).read(3) === Left(FutureOffset))
    // invalid (purged) offset on truncated log
    assert(filled(20, 5).read(3) === Left(OutOfRange))
    // plain read
    assert(filled(10, 10).read(3).map(new String(_)) === Right("3"))
    // read on truncated log
    assert(filled(20, 5).read(11).map(new String(_)) === Right("11"))
    // start offset 10, 10 records: offset 11 holds payload "1"
    assert(filled(10, 10, start = 10).read(11).map(new String(_)) === Right("1"))
    // start offset 20, truncated: offset 31 holds payload "11"
    assert(filled(20, 5, start = 20).read(31).map(new String(_)) === Right("11"))
    // future offset beyond latest
    assert(filled(10, 10).read(25) === Left(FutureOffset))
  }

  // --- Test_streamEvents vectors (server_test.go:293-416) ---
  test("watch: default start skips existing; replay; purged start errors") {
    // no data on empty log
    assert(new OffsetLog(0, 10).watch() === Right(Seq.empty))
    // 3 records, no offset specified => nothing (only-new-events default)
    assert(filled(3, 10).watch() === Right(Seq.empty))
    // 3 records, offset 0 => 0,1,2
    assert(filled(3, 10).watch(Some(0)).map(_.map(p => new String(p._2))) ===
      Right(Seq("0", "1", "2")))
    // 20 records segment 5, offset 0 => out of range
    assert(filled(20, 5).watch(Some(0)) === Left(OutOfRange))
    // 15 records segment 5 (log holds 5..14), offset 10 => 10..14
    assert(filled(15, 5).watch(Some(10)).map(_.map(_._1)) === Right(10L to 14L))
    // negative start is OutOfRange on every log state — on an EMPTY log it
    // used to skip the purged-start guard and crash the snapshot loop
    assert(new OffsetLog(0, 10).watch(Some(-1)) === Left(OutOfRange))
    assert(filled(3, 10).watch(Some(-1)) === Left(OutOfRange))
  }

  test("write: oversize record rejected (memlog max record size)") {
    val log = new OffsetLog(0, 10, maxRecordBytes = 8)
    assert(log.write(Array.fill[Byte](9)(1)).isLeft)
    assert(log.write(Array.fill[Byte](8)(1)) === Right(0L))
  }

  test("offsets are dense and monotonic across segment rolls") {
    val log = filled(23, 5)
    val r   = log.range
    assert(log.snapshot.map(_._1) === (r.earliest to r.latest))
    assert(r.latest === 22L)
  }

  // --- e2e: DSv2 feed → envelope → serialize → offset-log sink ---
  test("e2e ingest replays the feed with offset==event_id and reference pacing") {
    val spark  = TestSpark.spark
    val result = Ingest.run(spark, "/root/testdata/sf0.001", maxBatchSize = 50)
    assert(result.rejected === 0L)
    val r = result.log.range
    // sf0.001 has 1000 events with dense ids 0..999
    assert((r.earliest, r.latest) === ((0L, 999L)))

    // every stored record is a valid CloudEvent whose id round-trips (the
    // reference e2e's cloudevents.Event.Validate + id check, main_test.go:81-87)
    val parsed = Ingest.parsed(Ingest.logFrame(spark, result.log))
    val badCount = parsed.filter(
      col("ce.specversion") =!= "1.0" ||
        col("ce.id").cast("long") =!= col("offset") ||
        col("ce.data.event_id") =!= col("offset") ||
        !col("ce.type").startsWith("vmware.vsphere.")).count()
    assert(badCount === 0L)
    assert(parsed.count() === 1000L)
  }

  test("e2e ingest with small segments retains only the last 2×segmentSize") {
    val spark  = TestSpark.spark
    val result = Ingest.run(spark, "/root/testdata/sf0.001", maxBatchSize = 200, segmentSize = 100)
    val r      = result.log.range
    // 1000 writes, segment 100: history 800..899, active 900..999
    assert((r.earliest, r.latest) === ((800L, 999L)))
    assert(result.log.size === 200)
  }

  test("ingest rejects oversize records like memlog (512 KiB guard analog)") {
    val spark = TestSpark.spark
    // tiny cap: every serialized CloudEvent exceeds 64 bytes => all rejected
    val result = Ingest.run(spark, "/root/testdata/sf0.001",
      maxBatchSize = 500, maxRecordBytes = 64)
    assert(result.rejected === 1000L)
    assert(result.log.size === 0)
  }

  test("ingest honors startingTimestamp (the reference's replay-begin window)") {
    val spark = TestSpark.spark
    // midpoint of the sf0.001 time range — via the schema-adaptive ingress,
    // not a raw read (the on-disk ts encoding is the driver's to change)
    val mid = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(expr("timestamp_micros(cast(percentile(unix_micros(ts), 0.5) as long))").cast("string"))
      .head().getString(0)
    val result = Ingest.run(spark, "/root/testdata/sf0.001", maxBatchSize = 500,
      startingTimestamp = Some(mid))
    val n = result.log.size
    assert(n > 0 && n < 1000)
    // begin offset aligns with the first unfiltered event id (O2 bootstrap)
    assert(result.log.range.earliest === 1000L - n)
  }

  test("feed load enforces the driver-side replay envelope with a named error") {
    TestSpark.spark // ensure an active session for EventFeed.load
    // a directory above the cap must fail with the envelope named — not an
    // opaque driver OOM mid-collect (VERDICT r09 item 5; the analytic-scale
    // path is Tables.events, never this driver-side emulation)
    val e = intercept[IllegalArgumentException] {
      graft.sources.EventFeed.load(
        "/root/testdata/sf0.001/events.parquet", None, maxFeedRows = 999L)
    }
    assert(e.getMessage.contains("replay envelope"))
    assert(e.getMessage.contains("maxFeedRows"))
    // at the cap exactly, the load succeeds (bound is inclusive)
    val ok = graft.sources.EventFeed.load(
      "/root/testdata/sf0.001/events.parquet", None, maxFeedRows = 1000L)
    assert(ok.length === 1000)
  }
}
