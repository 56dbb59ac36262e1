package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomPruneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("no false negatives: every dim key survives the prune") {
    val dim  = spark.range(0, 1000).select((col("id") * 3).as("k"))
    val fact = spark.range(0, 3000).select(col("id").as("k"))
    val kept = BloomPrune.prune(fact, "k", dim, "k").select("k")
      .as[Long].collect().toSet
    val members = (0L until 3000L).filter(_ % 3 == 0)
    assert(members.forall(kept.contains), "a true member was pruned")
  }

  test("false-positive rate is near the requested fpp") {
    val dim  = spark.range(0, 10000).select(col("id").as("k"))
    // disjoint probe set: ids 1M..1.1M — any survivor is a false positive
    val probe = spark.range(1000000, 1100000).select(col("id").as("k"))
    val fp = BloomPrune.prune(probe, "k", dim, "k", fpp = 0.01).count()
    assert(fp < 100000 * 0.03, s"false-positive count $fp exceeds 3x the 1% budget")
    assert(fp > 0, "a 1% bloom over 100k disjoint probes should show some FPs")
  }

  test("pruned exact join equals the plain join") {
    val dim = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    val fact  = Tables.lineitem(spark, dir)
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val pruned = BloomPrune.prune(fact, "l_orderkey", dim, "o_orderkey")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }

  test("Observation metrics report prune selectivity in-flight (no second scan)") {
    val dim = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    val obs = org.apache.spark.sql.Observation("bloom_prune")
    val out = BloomPrune.prune(Tables.lineitem(spark, dir), "l_orderkey", dim, "o_orderkey")
      .observe(obs, count(lit(1)).as("kept"))
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    out.collect()
    val kept  = obs.get("kept").asInstanceOf[Long]
    val total = Tables.lineitem(spark, dir).count()
    assert(kept > 0 && kept < total / 2,
      s"observed kept=$kept of $total — prune metric implausible")
  }

  test("the bloom predicate actually cuts the fact side ahead of the join") {
    val dim = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    val fact   = Tables.lineitem(spark, dir)
    val total  = fact.count()
    val kept   = BloomPrune.prune(fact, "l_orderkey", dim, "o_orderkey").count()
    val truly  = fact.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept < total / 2, s"prune kept $kept of $total — dim cut not selective?")
    assert(kept >= truly, "prune must keep a superset of the joinable rows")
  }
}
