package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Catalog statistics → cost-based optimization, end-to-end: at 100 TB the
 * difference between a stats-blind and a stats-driven plan is the
 * difference between a broadcast and a 100 TB shuffle, so the ANALYZE
 * TABLE plumbing (table + column stats into the session catalog, CBO
 * cardinality estimates out of it) is part of the engine surface, not an
 * ops nicety.
 */
class StatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("ANALYZE TABLE feeds row counts and column stats into CBO estimates") {
    val db = "graft_stats"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val customer = spark.read.parquet(s"$dir/customer.parquet")
      orders.write.mode("overwrite").saveAsTable(s"$db.orders")
      customer.write.mode("overwrite").saveAsTable(s"$db.customer")
      val nOrders = orders.count()

      // before ANALYZE: no rowCount in the catalog
      assert(spark.table(s"$db.orders").queryExecution.optimizedPlan.stats.rowCount.isEmpty)

      spark.sql(s"ANALYZE TABLE $db.orders COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql(s"ANALYZE TABLE $db.customer COMPUTE STATISTICS FOR ALL COLUMNS")

      // column stats: DESCRIBE surfaces distinct-count/min/max for the join key
      val desc = spark.sql(s"DESCRIBE EXTENDED $db.orders o_custkey")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc.get("distinct_count").exists(_.toLong > 0), s"got $desc")

      val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        // table stats: the exact ANALYZE row count is visible to the
        // optimizer (rowCount only surfaces through plan stats under CBO)
        val scanStats = spark.table(s"$db.orders").queryExecution.optimizedPlan.stats
        assert(scanStats.rowCount.contains(BigInt(nOrders)), s"got $scanStats")

        // CBO cardinality flows through a filtered join: the estimate must
        // be finite, nonzero, and far below the cartesian bound
        val joined = spark.sql(
          s"""SELECT c.c_mktsegment, o.o_totalprice FROM $db.orders o
             |JOIN $db.customer c ON o.o_custkey = c.c_custkey
             |WHERE o.o_orderstatus = 'O'""".stripMargin)
        val est = joined.queryExecution.optimizedPlan.stats.rowCount
        assert(est.isDefined, "CBO should estimate join cardinality from stats")
        assert(est.get > 0 && est.get <= BigInt(nOrders),
          s"join estimate should be ≤ |orders| for a key join, got $est")
      } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
