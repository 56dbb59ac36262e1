package graft.expressions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sketch(df: org.apache.spark.sql.DataFrame, capacity: Int): Map[String, Long] =
    df.agg(TopKSketch.heavyHitters(col("tok"), capacity).as("s"))
      .select(explode(col("s")).as("hh"))
      .select("hh.tok", "hh.n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when capacity >= distinct items, across partition merges") {
    import spark.implicits._
    // 5 tokens with known frequencies, scattered over 16 partitions
    val rows = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(30)("c") ++
      Seq.fill(9)("d") ++ Seq.fill(1)("e")
    val df = scala.util.Random.shuffle(rows).toDF("tok").repartition(16)
    assert(sketch(df, 64) === Map("a" -> 100L, "b" -> 60L, "c" -> 30L, "d" -> 9L, "e" -> 1L))
  }

  test("Misra-Gries guarantees under capacity pressure (adversarial vocabulary)") {
    import spark.implicits._
    // 2 heavy hitters in a sea of 5000 singletons; capacity 100 << vocab
    val n = 5000 + 400 + 300
    val rows = Seq.fill(400)("HOT1") ++ Seq.fill(300)("HOT2") ++
      (0 until 5000).map(i => s"noise_$i")
    val df  = scala.util.Random.shuffle(rows).toDF("tok").repartition(8)
    val out = sketch(df, 100)
    // every item with true freq > n/capacity (= 57) must survive
    assert(out.contains("HOT1") && out.contains("HOT2"))
    assert(out.size <= 100)
    // counts undercount by at most n/capacity
    assert(out("HOT1") <= 400L && out("HOT1") >= 400L - n / 100)
    assert(out("HOT2") <= 300L && out("HOT2") >= 300L - n / 100)
  }

  test("usable from SQL via the injected graft_topk function") {
    import spark.implicits._
    Seq("x", "x", "y").toDF("tok").createOrReplaceTempView("toks")
    val out = spark.sql(
      "SELECT explode(graft_topk(tok, 8)) AS hh FROM toks")
      .select("hh.tok", "hh.n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("x" -> 2L, "y" -> 1L))
  }
}
