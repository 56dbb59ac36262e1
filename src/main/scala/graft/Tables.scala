package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed view of an `events` row (the Dataset[T] façade; SURVEY §1.3). */
final case class EventRow(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/**
 * Loaders for the driver-generated parquet tables (TESTDATA.md).
 *
 * All loads are plain `spark.read.parquet` — schema comes from the files,
 * filters/projections push down to the scan. The one normalization is the
 * `events` table: its `ts` column is INT64 TIMESTAMP(NANOS), which Spark
 * reads only with `spark.sql.legacy.parquet.nanosAsLong=true` (as a raw
 * LongType of nanoseconds). We floor-divide to microseconds and rebuild a
 * TimestampType column — the exact truncation DuckDB applies when it reads
 * the same file, so oracle comparisons see identical instants.
 */
object Tables {

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  val extended: Seq[String] = Seq("events", "documents", "embeddings")

  val all: Seq[String] = tpch ++ extended

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** `events` with `ts` normalized from ns-long to a µs TimestampType.
    * Schema-adaptive: the driver-generated files carry INT64
    * TIMESTAMP(NANOS) (read as a raw long under `nanosAsLong`), while
    * derived directories (the ScaleUp sf1 rehearsal slice) carry a plain
    * INT64 — both arrive as LongType and get the same µs rebuild. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // FLOOR division, not `div` (truncate-toward-zero): a pre-1970
        // negative ns value must round toward the past like DuckDB's
        // ns→µs conversion does, or every ts projection hash-mismatches
        // on such a corpus. pmod makes the remainder non-negative, so
        // subtracting it floors for either sign.
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case _ => raw
    }
  }

  /** Typed events Dataset (case-class Encoder; compile-time field safety). */
  def eventsDs(spark: SparkSession, dir: String): Dataset[EventRow] = {
    import spark.implicits._
    events(spark, dir).as[EventRow]
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
