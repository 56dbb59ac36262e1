package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks

/**
 * Paging clamp + offset-validation semantics, pinned by the reference's own
 * table-driven vectors (`cmd/server/server_test.go:418-510` for getStart,
 * `server_test.go:94-209` for the point-read error mapping).
 */
class GetStartSpec extends AnyFunSuite with TableDrivenPropertyChecks {

  // the exact 8 vectors from server_test.go:418-501
  private val vectors = Table(
    ("earliest", "latest", "pageSize", "want"),
    (-1L, -1L, 50, -1L),
    (0L, 10L, 50, 0L),
    (0L, 100L, 50, 51L),
    (99L, 100L, 50, 99L),
    (99L, 100L, 50, 99L),
    (51L, 89L, 50, 51L),
    (151L, 304L, 50, 255L),
    (151L, 304L, 10, 295L)
  )

  test("getStart matches the reference test vectors") {
    forAll(vectors) { (earliest, latest, pageSize, want) =>
      assert(EventLog.getStart(earliest, latest, pageSize) === want)
    }
  }

  test("getStart properties: clamp lower bound, page covers at most pageSize records") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val earliest = rnd.nextLong(1000000L)
      val latest   = earliest + rnd.nextLong(100000L)
      val page     = 1 + rnd.nextInt(1000)
      val start    = EventLog.getStart(earliest, latest, page)
      assert(start >= earliest)
      assert(start <= latest)
      assert(latest - start + 1 <= page || start == earliest)
    }
  }

  // point-read error mapping, vectors from Test_getEvent (server_test.go:94-209)
  test("checkOffset maps purged/future offsets like the reference") {
    import EventLog._
    // empty log, any offset => future-ish error (reference: 400 "future offset")
    assert(checkOffset(LogRange(-1, -1), 3) === Left(EmptyLog))
    // truncated log 10..19 (20 writes, segment 5): offset 3 purged
    assert(checkOffset(LogRange(10, 19), 3) === Left(OutOfRange))
    // readable offsets on plain and truncated logs
    assert(checkOffset(LogRange(0, 9), 3) === Right(3))
    assert(checkOffset(LogRange(10, 19), 11) === Right(11))
    // start-offset-10 log holding 10 records: 11 readable
    assert(checkOffset(LogRange(10, 19), 11) === Right(11))
    // future offset beyond latest
    assert(checkOffset(LogRange(0, 9), 10) === Left(FutureOffset))
  }

  test("retention invariant: truncated log retains at most 2×segmentSize") {
    // reference Test_getRange: 20 writes, segment 5 => {earliest:10, latest:19}
    val seg    = 5
    val writes = 20L
    val latest = writes - 1
    val earliest = math.max(0L, writes - 2L * seg)
    assert(earliest === 10L && latest === 19L)
    assert(latest - earliest + 1 <= 2L * seg)
  }
}
