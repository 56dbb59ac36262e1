package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-layout scale story: bucketing both sides of a recurring join on
 * the join key makes the join shuffle-free (no Exchange in the plan) —
 * at 100 TB this is the difference between re-shuffling the fact table on
 * every query and scanning co-located buckets. Verified by planning, not
 * by prose: the test asserts the executed plan contains no shuffle.
 */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val orders   = Tables.orders(spark, "/root/testdata/sf0.001")
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    orders.write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$dir/orders_b").saveAsTable("orders_b")
    customer.write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$dir/customer_b").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the test exercises the bucketed SMJ path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

      val planBeforeAgg = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(!planBeforeAgg.contains("Exchange"),
        s"bucketed join should be shuffle-free, plan:\n$planBeforeAgg")

      // and it still computes the right answer
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("parquet scan prunes columns and pushes filters (pushdown sanity)") {
    val plan = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter(col("o_totalprice") > 100000)
      .select("o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000"),
      s"filter should push to the parquet scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"scan should read only the needed columns:\n$plan")
  }

  test("compaction: small-file sprawl → few clustered files, content identical") {
    import spark.implicits._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")

    // the small-file problem a streaming file sink produces: 64 files for
    // a table that fits comfortably in 4
    val sprawl = graft.ScratchDirs.dir("graft-sprawl")
    events.repartition(64).write.mode("overwrite").parquet(sprawl)
    def files(p: String) =
      new java.io.File(p).listFiles.count(f => f.getName.endsWith(".parquet"))
    assert(files(sprawl) === 64)

    // compact = range-recluster on the scan key while rewriting: fewer
    // files AND restored event_id locality (row-group pruning works again)
    val compact = graft.ScratchDirs.dir("graft-compact")
    spark.read.parquet(sprawl)
      .repartitionByRange(4, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(compact)
    assert(files(compact) === 4)

    // content identical
    val before = events.orderBy("event_id").as[(Long, Long, Double)].collect()
    val after = spark.read.parquet(compact)
      .orderBy("event_id").as[(Long, Long, Double)].collect()
    assert(after === before)

    // clustering restored: per-file event_id ranges are pairwise disjoint
    val ranges = spark.read.parquet(compact)
      .groupBy(input_file_name().as("f"))
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "file ranges overlap")
      case _                         =>
    }
  }

  test("REBALANCE hint right-sizes write partitions at runtime (AQE)") {
    // the declarative alternative to manual repartition-before-write: the
    // optimizer inserts a rebalance shuffle and AQE coalesces/splits its
    // output to target-size partitions from ACTUAL byte counts — on a
    // 1000-executor writer this is what prevents both 10k tiny files and
    // one 50 GB straggler file, without hand-tuning a partition count
    val out = graft.ScratchDirs.dir("graft-rebalance")
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
      .repartition(64) // inherited sprawl from an upstream stage
      .hint("rebalance")
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(files < 64, s"AQE rebalance should coalesce the 64-way sprawl, wrote $files files")
    // and nothing was lost in the rebalance shuffle
    assert(spark.read.parquet(out).count() ===
      Tables.events(spark, "/root/testdata/sf0.001").count())
  }
}
