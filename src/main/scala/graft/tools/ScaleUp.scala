package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Derives a larger scale factor from an existing testdata directory by
 * unioning `factor` key-shifted copies of each table — the scale-rehearsal
 * harness for measuring how the batch registry's plans behave at 10× the
 * largest driver-generated SF (sf0.1 → ~sf1).
 *
 * Key design points, chosen so a copy-union actually measures SCALING and
 * not an artifact:
 *  - every table's keys are offset per copy (doc_id/vec_id/event_id/
 *    orderkey by 10M, custkey/user_id by 1M) so key cardinality grows 10×
 *    like a real SF bump — state and shuffle keys widen, they don't deepen;
 *  - `documents.text` is perturbed per copy by prefixing every token with
 *    a copy tag ("c3the quick …"): within a copy the near-dup/winnowing
 *    structure is preserved verbatim, across copies Jaccard collapses to
 *    ~0 — so MinHash-LSH/winnowing workloads scale like 10 independent
 *    corpora instead of exploding quadratically on 10 exact clones of
 *    every document (which would measure the clone blowup, not the plan).
 *    The tag pushes tokens past the 8-byte bound [[graft.queries.SimHashOracle]]
 *    relies on, so scaled dirs are BENCH-ONLY — never point the DuckDB
 *    oracle compare at them (the driver never does; it compares only the
 *    driver-generated testdata SFs, where DedupSpec pins the bound);
 *  - dimension tables (region/nation/supplier/part) stay fixed, like the
 *    broadcast side of a real warehouse at any SF; lineitem keeps its
 *    part/supp keys so dim joins stay valid;
 *  - `events.ts` is kept as the RAW nanosecond long ([[graft.Tables]] is
 *    schema-adaptive), other columns ride along unchanged.
 *
 * Usage: runMain graft.tools.ScaleUp <srcDir> <destDir> [factor=10]
 */
object ScaleUp {

  private val BigStep  = 10000000L // doc/vec/event/order keyspace stride
  private val UserStep = 1000000L  // user/cust keyspace stride

  private def copies(factor: Int)(one: Int => DataFrame): DataFrame =
    (0 until factor).map(one).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val src    = args(0)
    val dest   = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite").parquet(s"$dest/$name.parquet")

    // dims: fixed at any SF (the broadcast side)
    for (t <- Seq("region", "nation", "supplier", "part"))
      write(spark.read.parquet(s"$src/$t.parquet"), t, 1)

    val customer = spark.read.parquet(s"$src/customer.parquet")
    write(copies(factor) { i =>
      customer.withColumn("c_custkey", col("c_custkey") + lit(i * UserStep))
    }, "customer", 4)

    val orders = spark.read.parquet(s"$src/orders.parquet")
    write(copies(factor) { i =>
      orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * BigStep))
        .withColumn("o_custkey", col("o_custkey") + lit(i * UserStep))
    }, "orders", 8)

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    write(copies(factor) { i =>
      lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(i * BigStep))
    }, "lineitem", 16)

    // events: ts stays the raw ns long so the destination reads through the
    // same Tables.events normalization path as the driver-generated files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$src/events.parquet")
    require(events.schema("ts").dataType == LongType, "expected ns-long ts")
    write(copies(factor) { i =>
      events
        .withColumn("event_id", col("event_id") + lit(i * BigStep))
        .withColumn("user_id", col("user_id") + lit(i * UserStep))
    }, "events", 16)

    val documents = spark.read.parquet(s"$src/documents.parquet")
    write(copies(factor) { i =>
      val text =
        if (i == 0) col("text")
        else array_join(
          transform(split(col("text"), " +"), t => concat(lit(s"c$i"), t)), " ")
      documents
        .withColumn("doc_id", col("doc_id") + lit(i * BigStep))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents", 16)

    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    write(copies(factor) { i =>
      embeddings.withColumn("vec_id", col("vec_id") + lit(i * BigStep))
    }, "embeddings", 8)

    println(s"""{"scaleup":"done","src":"$src","dest":"$dest","factor":$factor}""")
    spark.stop()
  }
}
