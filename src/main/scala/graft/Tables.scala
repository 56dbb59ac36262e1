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
 * `events` table's `ts` column, whose ON-DISK encoding is owned by the
 * driver and has drifted across rounds (INT64 TIMESTAMP(NANOS) through
 * round 7, plain `timestamp[us]` TIMESTAMP_NTZ since round 8's
 * regeneration). [[normalizeTs]] is the ONE place that maps any plausible
 * encoding to the engine's canonical type, and every events ingress —
 * [[events]], [[graft.sources.EventFeed]], [[graft.tools.ScaleUp]] — routes
 * through it, so a future regeneration changes behavior in exactly one
 * function (round 8 had three hard-coded copies of the ns-long assumption
 * and lost the whole streaming surface to a schema drift; the reference
 * survives payload drift because it never inspects `data` —
 * `server.go:294-300` — and this is the typed-ingress equivalent).
 */
object Tables {

  /**
   * Schema-adaptive `ts` normalizer: whatever encoding the parquet file
   * carries → µs-precision `TimestampType` (the engine's canonical ts).
   *
   *  - `LongType` — INT64 nanoseconds (TIMESTAMP(NANOS) read as a raw long
   *    under `spark.sql.legacy.parquet.nanosAsLong`, or a plain INT64 from
   *    a derived slice). FLOOR-divided to µs, not truncated-toward-zero: a
   *    pre-1970 negative ns value must round toward the past like DuckDB's
   *    ns→µs conversion does, or every ts projection hash-mismatches on
   *    such a corpus. `pmod` makes the remainder non-negative, so
   *    subtracting it floors for either sign.
   *  - `TimestampNTZType` — `timestamp[us]` with `isAdjustedToUTC=false`
   *    (the driver's current encoding; DuckDB reads it as naive TIMESTAMP).
   *    Under the engine's pinned UTC session timezone
   *    ([[GraftSession.configure]]) the cast to `TimestampType` is a
   *    wall-clock identity, so oracle comparisons see identical instants.
   *  - `TimestampType` — `timestamp[us]` UTC-adjusted: already canonical.
   *
   * Any other type fails loudly here, at the ingress, instead of as an
   * AnalysisException at stream start 140 queries later.
   */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // backquoted: tsCol is caller-supplied and must parse as a column
        // REFERENCE, not as SQL (an unquoted "ts-ns" would parse as ts
        // minus ns)
        df.withColumn(tsCol,
          timestamp_micros(expr(s"(`$tsCol` - pmod(`$tsCol`, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        throw new IllegalArgumentException(
          s"events '$tsCol' has unsupported encoding $other — expected INT64 " +
            "nanos (LongType under nanosAsLong), TIMESTAMP_NTZ (timestamp[us]), " +
            "or TIMESTAMP (UTC-adjusted micros)")
    }

  /** The shared events-file ingress: read `path` with the nanos-as-long
    * escape hatch enabled (a no-op for non-NANOS encodings) and normalize
    * `ts`. Both the batch table view ([[events]]) and the streaming feed
    * ([[graft.sources.EventFeed.load]]) land here.
    *
    * Graft sessions already pin the flag in [[GraftSession.configure]]; the
    * set here only covers a foreign session pointed at a NANOS-encoded
    * directory. When the directory is NOT nanos-encoded (ts infers as
    * anything but LongType — every driver encoding since round 8), the
    * previous value is restored so an events read never leaks the legacy
    * flag into the session: a later non-events read of a TIMESTAMP(NANOS)
    * column must still fail loudly (PARQUET_TYPE_ILLEGAL) rather than
    * silently arrive as LongType. When ts DOES infer as LongType the flag
    * stays set — the lazy parquet scan re-reads it at execution time, so
    * restoring it would break the read the hatch exists for (this matches
    * the session-wide pin a graft session has anyway). */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val key  = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    def restore(): Unit = prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(path)
      if (raw.schema("ts").dataType != org.apache.spark.sql.types.LongType)
        restore()
      normalizeTs(raw)
    } catch {
      // a missing path / absent ts column / unsupported encoding must not
      // leave the legacy flag leaked into the session the docstring above
      // promises it never leaks into
      case e: Throwable => restore(); throw e
    }
  }

  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  val extended: Seq[String] = Seq("events", "documents", "embeddings")

  val all: Seq[String] = tpch ++ extended

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** `events` with `ts` normalized to the canonical µs TimestampType
    * regardless of the directory's on-disk encoding ([[normalizeTs]]). */
  def events(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, s"$dir/events.parquet")

  /** Typed events Dataset (case-class Encoder; compile-time field safety). */
  def eventsDs(spark: SparkSession, dir: String): Dataset[EventRow] = {
    import spark.implicits._
    events(spark, dir).as[EventRow]
  }

  /** Exact row count of a parquet file (or directory of parquet files),
    * summed from footer metadata — driver-side I/O only, never a Spark job.
    * Bit-identical to `spark.read.parquet(path).count()`: parquet footers
    * record exact per-file row counts, and the ts normalization projections
    * never add or drop rows. Exists because several per-query preludes
    * (streaming batch pacing, the EventFeed replay-envelope guard) need
    * only this number, and a full job round-trip per prelude was a measured
    * ~0.2 s × dozens of streaming queries per bench pass (round 15). */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs   = root.getFileSystem(conf)
    def sum(st: org.apache.hadoop.fs.FileStatus, isRoot: Boolean): Long = {
      // same visibility rule as Spark's file index, applied to FILES AND
      // DIRECTORIES alike (a leftover _temporary/ from an interrupted
      // write holds part-files Spark would never count): _metadata/
      // _SUCCESS/_temporary/dot-entries are not data. The root itself is
      // exempt — the caller named it explicitly.
      val name = st.getPath.getName
      if (!isRoot && (name.startsWith("_") || name.startsWith("."))) 0L
      else if (st.isDirectory)
        fs.listStatus(st.getPath).map(sum(_, isRoot = false)).sum
      else {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
        val r  = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }
    }
    sum(fs.getFileStatus(root), isRoot = true)
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
