package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DenseOffsetsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("dense gap-free offsets in key order from unordered, gappy input") {
    import spark.implicits._
    // keys are sparse (multiples of 3) and arrive shuffled across partitions
    val keys = scala.util.Random.shuffle((0 until 500).map(_ * 3L).toVector)
    val df   = keys.toDF("k").repartition(13)
    val out = DenseOffsets.assign(df, "k", base = 1000L, partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 500)
    val byOffset = out.sortBy(_._2)
    // offsets are exactly base..base+n-1 (dense, no gaps, no dupes)
    assert(byOffset.map(_._2).toSeq === (1000L until 1500L))
    // and ascend in key order
    assert(byOffset.map(_._1).toSeq === (0 until 500).map(_ * 3L))
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val out = DenseOffsets.assign(Seq.empty[Long].toDF("k"), "k", base = 0L)
    assert(out.count() === 0)
  }
}
