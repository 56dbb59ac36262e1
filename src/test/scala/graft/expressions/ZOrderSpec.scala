package graft.expressions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave: bit-exact on known values, masks above 21 bits") {
    // x=101b on even bits, y=011b on odd bits → 11011b = 27
    assert(ZOrder.interleave(5L, 3L) === 27L)
    assert(ZOrder.interleave(0L, 0L) === 0L)
    assert(ZOrder.interleave(ZOrder.Mask, ZOrder.Mask) === (1L << 42) - 1)
    // only the low 21 bits of each input participate
    assert(ZOrder.interleave((1L << 21) + 5L, 3L) === ZOrder.interleave(5L, 3L))
    assert(ZOrder.interleave(5L, (1L << 30) + 3L) === ZOrder.interleave(5L, 3L))
  }

  test("graft_zorder SQL function matches the Scala reference (codegen path)") {
    val got = spark.range(0, 2000)
      .selectExpr("id", "graft_zorder(id * 7, id * 13) AS z")
      .as[(Long, Long)].collect()
    got.foreach { case (id, z) =>
      assert(z === ZOrder.interleave(id * 7, id * 13))
    }
  }

  test("round-6 injected functions are reachable from plain SQL text") {
    // the SessionExtensions injection is the public SQL surface — every
    // native expression must be callable without the Scala DSL
    val z = spark.sql("SELECT graft_zorder(5L, 3L) AS z").head().getLong(0)
    assert(z === ZOrder.interleave(5L, 3L))
    val fps = spark.sql("SELECT graft_winnow('the quick brown fox jumps over dog') AS f")
      .head().getSeq[Long](0)
    assert(fps.nonEmpty && fps === fps.sorted)
    val noFps = spark.sql("SELECT graft_winnow('short') AS f").head().getSeq[Long](0)
    assert(noFps.isEmpty)
  }

  test("z-order layout bounds BOTH columns' per-file ranges; linear bounds one") {
    val n    = 1 << 16
    val side = 1024L
    // deterministic pseudo-uniform grid points
    val pts = spark.range(0, n)
      .select(
        (col("id") * 2654435761L % side).as("x"),
        (col("id") * 40503L % side).as("y"))

    def fileRanges(df: org.apache.spark.sql.DataFrame, sortCol: String): (Double, Double) = {
      val out = graft.ScratchDirs.dir(s"graft-zorder-$sortCol")
      df.repartitionByRange(8, col(sortCol)).sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(out)
      val r = spark.read.parquet(out)
        .groupBy(input_file_name())
        .agg(
          (max("x") - min("x")).cast("double").as("xr"),
          (max("y") - min("y")).cast("double").as("yr"))
        .agg(avg("xr"), avg("yr"))
        .as[(Double, Double)].head()
      r
    }

    val (linX, linY) = fileRanges(pts, "x")
    val (zX, zY)     = fileRanges(pts.withColumn("z", expr("graft_zorder(x, y)")), "z")

    // linear-on-x: x tightly bounded, y spans the whole domain
    assert(linX < side * 0.3, s"linear x-range $linX")
    assert(linY > side * 0.9, s"linear y-range $linY")
    // z-order: BOTH dimensions bounded well below the full domain
    assert(zX < side * 0.6, s"zorder x-range $zX")
    assert(zY < side * 0.6, s"zorder y-range $zY")
  }
}
