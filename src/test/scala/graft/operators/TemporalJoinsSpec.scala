package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofBackward: most recent prior value, ties included, no-match is NULL") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 12:00:00")),
      (2L, 20L, ts("2024-01-01 10:00:00"))   // user 2 has no right rows
    ).toDF("user_id", "event_id", "t")
    val right = Seq(
      (1L, 100L, ts("2024-01-01 09:00:00")),
      (1L, 101L, ts("2024-01-01 10:00:00")), // tie with left event 10 → included
      (1L, 102L, ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "rid", "rt")
    val out = TemporalJoins.asofBackward(left, right, "user_id", "t", "rt", "rid")
      .select("event_id", "asof_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(10L) === Some(101L)) // tie at 10:00 counts
    assert(out(11L) === Some(102L))
    assert(out(20L) === None)
  }

  test("rangeJoinBucketed matches a naive interval join across bucket boundaries") {
    val rnd = new scala.util.Random(3)
    val base = ts("2024-01-01 00:00:00").getTime
    val l = (1 to 200).map(i =>
      (i.toLong, 1L, new java.sql.Timestamp(base + rnd.nextInt(3600) * 1000L)))
      .toDF("lid", "k", "lt")
    val r = (1 to 200).map(i =>
      (i.toLong + 1000, 1L, new java.sql.Timestamp(base + rnd.nextInt(3600) * 1000L)))
      .toDF("rid", "k2", "rt")
    val bucketed = TemporalJoins.rangeJoinBucketed(l, r, "lt", "rt", 600L, Seq("k" -> "k2"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.join(r, col("k") === col("k2") &&
        col("rt") >= col("lt") && col("rt") < col("lt") + expr("INTERVAL 10 MINUTE"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(bucketed === naive)
  }

  test("rangeJoinBucketed works when both sides name the time column identically") {
    // the natural ts-vs-ts call — an unqualified col(\"ts\") in the
    // refinement filter would throw AMBIGUOUS_REFERENCE here
    val base = ts("2024-01-01 00:00:00").getTime
    val l = Seq((1L, new java.sql.Timestamp(base)))
      .toDF("lid", "ts")
    val r = Seq(
      (10L, new java.sql.Timestamp(base + 60 * 1000L)),   // inside [ts, ts+10m)
      (11L, new java.sql.Timestamp(base + 3600 * 1000L))  // outside
    ).toDF("rid", "ts")
    val out = TemporalJoins.rangeJoinBucketed(l, r, "ts", "ts", 600L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out === Set((1L, 10L)))
  }
}
