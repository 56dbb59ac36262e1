package graft.streaming

import graft.operators.EventLog.LogRange
import org.scalatest.funsuite.AnyFunSuite

/**
 * The transport-free API surface against the reference's handler vectors
 * (`server_test.go`): status codes, validation, truncation behavior.
 */
class ApiSpec extends AnyFunSuite {

  private def bytes(i: Int): Array[Byte] = i.toString.getBytes("UTF-8")
  private def filled(start: Long, n: Int, seg: Int = 1000): OffsetLog = {
    val log = new OffsetLog(start, seg)
    (0 until n).foreach(i => log.write(bytes(i)))
    log
  }

  test("range: 204 empty; plain; after truncation (server_test.go:23-92)") {
    assert(Api.range(new OffsetLog(0, 5)) === Api.NoContent)
    assert(Api.range(filled(0, 10)) === Api.Ok(LogRange(0, 9)))
    // 20 writes into size-5 segments => {earliest:10, latest:19}
    assert(Api.range(filled(0, 20, seg = 5)) === Api.Ok(LogRange(10, 19)))
  }

  test("getEvent: 400 on non-numeric / future / purged; raw bytes on hit (server_test.go:94-209)") {
    val log = filled(0, 20, seg = 5) // retains 10..19
    assert(Api.getEvent(log, "abc").status === 400)
    assert(Api.getEvent(log, "<script>").asInstanceOf[Api.BadRequest].message.contains("&lt;script&gt;"))
    assert(Api.getEvent(log, "99").status === 400)  // future
    assert(Api.getEvent(log, "3").status === 400)   // purged
    val hit = Api.getEvent(log, "15")
    assert(hit.status === 200)
    assert(new String(hit.asInstanceOf[Api.Ok[Array[Byte]]].value, "UTF-8") === "15")
    // shifted-start log: offset == write index + start
    val shifted = filled(10, 5)
    assert(new String(Api.getEvent(shifted, "12").asInstanceOf[Api.Ok[Array[Byte]]].value, "UTF-8") === "2")
  }

  test("getEvents: 204 empty; last <=50 ascending (server_test.go:211-291)") {
    assert(Api.getEvents(new OffsetLog(0, 5)) === Api.NoContent)
    val small = Api.getEvents(filled(0, 3)).asInstanceOf[Api.Ok[Seq[(Long, Array[Byte])]]].value
    assert(small.map(_._1) === Seq(0L, 1L, 2L))
    val big = Api.getEvents(filled(0, 120)).asInstanceOf[Api.Ok[Seq[(Long, Array[Byte])]]].value
    assert(big.map(_._1) === (70L to 119L))
  }

  test("watch: param validation, default start, replay, purged start (server_test.go:293-416)") {
    val log = filled(0, 5)
    assert(Api.watch(log, "TRUE").status === 400)  // exactly "true"
    assert(Api.watch(log, "1").status === 400)
    assert(Api.watch(log, "true", Some("x")).status === 400)
    // default start latest+1: nothing yet
    assert(Api.watch(log, "true").asInstanceOf[Api.Ok[Seq[(Long, Array[Byte])]]].value.isEmpty)
    // replay from 0
    assert(Api.watch(log, "true", Some("0")).asInstanceOf[Api.Ok[Seq[(Long, Array[Byte])]]]
      .value.map(_._1) === (0L to 4L))
    // partial replay 10..14 of a truncated log
    val trunc = filled(0, 15, seg = 5) // retains 5..14
    assert(Api.watch(trunc, "true", Some("10")).asInstanceOf[Api.Ok[Seq[(Long, Array[Byte])]]]
      .value.map(_._1) === (10L to 14L))
    // purged start => 400
    assert(Api.watch(filled(0, 20, seg = 5), "true", Some("0")).status === 400)
  }
}
