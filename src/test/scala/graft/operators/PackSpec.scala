package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def weighted(n: Int) =
    (1 to n).map(i => (i.toLong, ((i * 37) % 11 + 1).toLong)).toDF("id", "w")

  test("assignOffsets equals the single-partition window prefix sum") {
    val df = weighted(997)
    val got = Pack.assignOffsets(df, "id", "w")
      .select("id", "start_off").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("start_off", coalesce(
        sum("w").over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("id", "start_off").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("offsets are invariant to input partitioning and partition count") {
    val df = weighted(500)
    val a = Pack.assignOffsets(df.repartition(1), "id", "w", partitions = 3)
      .select("id", "start_off").as[(Long, Long)].collect().toMap
    val b = Pack.assignOffsets(df.repartition(13), "id", "w", partitions = 7)
      .select("id", "start_off").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("assignBins: bin is the bin of the document's first token") {
    val df = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 6L)).toDF("id", "w")
    // offsets: 0, 3, 7, 9 — budget 5 → bins 0, 0, 1, 1
    val bins = Pack.assignBins(df, "id", "w", budget = 5L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(bins === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("assignOffsetsBy equals per-group assignOffsets run on each slice") {
    // groups deliberately unbalanced and interleaved in id order, several
    // partitions, so groups both share partitions and span them
    val df = (1 to 800).map { i =>
      (i.toLong, Seq("train", "val", "test")(i % 7 % 3), ((i * 37) % 11 + 1).toLong)
    }.toDF("id", "g", "w")
    val got = Pack.assignOffsetsBy(df, "g", "id", "w", partitions = 5)
      .select("g", "id", "start_off").as[(String, Long, Long)].collect().toSet
    val want = Seq("train", "val", "test").map { g =>
      Pack.assignOffsets(df.where($"g" === g), "id", "w", partitions = 5)
        .select("g", "id", "start_off").as[(String, Long, Long)].collect().toSet
    }.reduce(_ union _)
    assert(got === want)
  }

  test("non-long weight column is rejected") {
    val df = Seq((1L, 2)).toDF("id", "w") // w is IntegerType
    val e = intercept[IllegalArgumentException](Pack.assignOffsets(df, "id", "w"))
    assert(e.getMessage.contains("LongType"))
  }

  test("assignOffsetsBy: a null group fails loudly (the stated contract, enforced)") {
    val df = Seq((1L, "a", 2L), (2L, null.asInstanceOf[String], 3L), (3L, "b", 1L))
      .toDF("id", "g", "w")
    val e = intercept[org.apache.spark.SparkException](
      Pack.assignOffsetsBy(df, "g", "id", "w", partitions = 2).collect())
    assert(e.getMessage.contains("null g") || e.getCause != null)
  }

  test("assignOffsetsBy: data-sized group cardinality trips the driver-state bound") {
    // every row its own group: (partition, group) entries == rows, far
    // over a tiny bound — the guard must name the problem, not OOM later
    val df = (1 to 200).map(i => (i.toLong, s"g$i", 1L)).toDF("id", "g", "w")
    val e = intercept[IllegalArgumentException](
      Pack.assignOffsetsBy(df, "g", "id", "w", partitions = 4, maxDriverEntries = 50L))
    assert(e.getMessage.contains("driver-state bound"))
  }
}
