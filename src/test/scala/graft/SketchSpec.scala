package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Accuracy bounds for the approximate sketches exposed as rows-only
 * queries (no SQL-portable oracle): the sketch answer must track the
 * exact answer within the accuracy the sketch promises at its configured
 * size — that bound, not hash equality, is their correctness contract.
 */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_percentile(1000) tracks exact percentile per group") {
    val approx = SparkEntry.queries("q_approxq")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    // value spans ~[0,200]; accuracy 1000 keeps rank error ~1/1000 which
    // on these distributions is well under 2.0 absolute
    approx.foreach { case (k, (a50, a90)) =>
      val (e50, e90) = exact(k)
      assert(math.abs(a50 - e50) < 2.0, s"$k p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) < 2.0, s"$k p90: approx $a90 vs exact $e90")
    }
  }

  test("approx_count_distinct tracks exact distinct within rsd") {
    val approx = SparkEntry.queries("q_approxd")(spark, dir).head().getLong(0)
    val exact  = Tables.events(spark, dir).select("user_id").distinct().count()
    // default rsd 5% → assert 15% (3 sigma)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx $approx vs exact $exact")
  }

  test("HLL daily-sketch union equals the global sketch exactly (mergeability)") {
    val ev = Tables.events(spark, dir)
    ev.createOrReplaceTempView("graft_hll_spec")
    val merged = SparkEntry.queries("q_hll")(spark, dir).head().getLong(0)
    val global = spark.sql(
      "SELECT CAST(hll_sketch_estimate(hll_sketch_agg(user_id)) AS BIGINT) FROM graft_hll_spec")
      .head().getLong(0)
    // sketch merge is associative: per-day sketches unioned must give the
    // SAME estimate as one global sketch — this is what makes persisted
    // daily sketches re-aggregable over any date range without rescans
    assert(merged === global, s"merged $merged vs global $global")
    val exact = ev.select("user_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate $merged vs exact $exact")
  }

  test("sketch contracts hold through the shared SketchChecks (--sketch-cert path)") {
    // the SAME code `Probe --sketch-cert` runs at ScaleUp slices — pinned
    // here at a driver SF so the certificate and the spec cannot drift
    import graft.functions.SketchChecks
    val ev = Tables.events(spark, dir)
    val d = SketchChecks.approxDistinct(ev, "user_id")
    assert(d.relErr <= 0.15, s"approxd rel_err ${d.relErr}")
    val h = SketchChecks.hllMerge(ev, "user_id", col("ts").cast("date"))
    assert(h.merged === h.global, s"HLL merge ${h.merged} vs global ${h.global}")
    assert(h.relErr <= 0.05, s"hll rel_err ${h.relErr}")
    // approx_percentile's ACTUAL contract: returned value's rank within
    // eps·n of target (eps = 1/accuracy) — distribution-independent, so
    // it transfers unchanged to any ScaleUp slice
    val qs = SketchChecks.percentileRanks(ev, "event_type", "value", 1000, Seq(0.5, 0.9))
    assert(qs.nonEmpty)
    qs.foreach(q => assert(q.ok(0.001),
      s"${q.group} p=${q.p}: rank [${q.lt},${q.le}] of n=${q.n} misses ±0.001 band"))
  }
}
