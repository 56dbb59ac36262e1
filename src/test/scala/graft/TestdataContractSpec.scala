package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The generalized testdata-drift canary (companion to [[TsEncodingSpec]],
 * which pins the `events.ts` encodings specifically).
 *
 * `/root/testdata` is DRIVER-OWNED and has been regenerated with changed
 * physical encodings before (round 8: events.ts INT64-nanos →
 * `timestamp[us]`). The engine is deliberately schema-ADAPTIVE — every
 * numeric/vector/temporal ingress casts before use — so this spec pins the
 * TOLERATED FAMILY per column, not the exact physical type: it must stay
 * green across any regeneration the engine absorbs, and fail with a named
 * column the moment a drift exceeds what the adaptive ingresses handle
 * (the failure mode round 8 surfaced as 22 silently-missing registry
 * entries and 12 red specs instead).
 */
class TestdataContractSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // --- tolerated families (exactly what the engine's ingresses absorb) ---
  private val integral: DataType => Boolean = {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  // money/measure columns: engine sums via explicit DECIMAL casts and
  // compares at ROUND(,4) — any fractional source type works
  private val fractional: DataType => Boolean = {
    case _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }
  private val string: DataType => Boolean = _ == StringType
  // temporal: queries compare against date/timestamp literals and the
  // oracle compare normalizes DATE vs midnight-TIMESTAMP, so all three
  // parquet encodings are absorbed
  private val temporal: DataType => Boolean = {
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }
  // events.ts additionally tolerates the raw ns-long encoding (pre-round-8
  // files, ScaleUp legacy sources) via Tables.normalizeTs
  private val eventTs: DataType => Boolean = dt => temporal(dt) || integral(dt)
  // embedding vectors: every ANN/similarity path casts to array<double>;
  // VectorExpressions accepts float and double elements
  private val vector: DataType => Boolean = {
    case ArrayType(et, _) => fractional(et)
    case _ => false
  }

  private val contract: Map[String, Seq[(String, DataType => Boolean, String)]] = Map(
    "events" -> Seq(
      ("event_id", integral, "integral"),
      ("ts", eventTs, "temporal or ns-long"),
      ("user_id", integral, "integral"),
      ("event_type", string, "string"),
      ("value", fractional, "fractional"),
      ("props", string, "string")),
    "documents" -> Seq(
      ("doc_id", integral, "integral"),
      ("text", string, "string"),
      ("lang", string, "string"),
      ("source", string, "string"),
      ("n_chars", integral, "integral")),
    "embeddings" -> Seq(
      ("vec_id", integral, "integral"),
      ("embedding", vector, "array<float|double|decimal>"),
      ("label", integral, "integral")),
    "lineitem" -> Seq(
      ("l_orderkey", integral, "integral"),
      ("l_partkey", integral, "integral"),
      ("l_suppkey", integral, "integral"),
      ("l_quantity", fractional, "fractional"),
      ("l_extendedprice", fractional, "fractional"),
      ("l_discount", fractional, "fractional"),
      ("l_tax", fractional, "fractional"),
      ("l_returnflag", string, "string"),
      ("l_linestatus", string, "string"),
      ("l_shipdate", temporal, "temporal")),
    "orders" -> Seq(
      ("o_orderkey", integral, "integral"),
      ("o_custkey", integral, "integral"),
      ("o_orderstatus", string, "string"),
      ("o_totalprice", fractional, "fractional"),
      ("o_orderdate", temporal, "temporal")),
    "customer" -> Seq(
      ("c_custkey", integral, "integral"),
      ("c_nationkey", integral, "integral"),
      ("c_acctbal", fractional, "fractional"),
      ("c_mktsegment", string, "string")),
    "part" -> Seq(
      ("p_partkey", integral, "integral"),
      ("p_brand", string, "string"),
      ("p_type", string, "string"),
      ("p_size", integral, "integral"),
      ("p_retailprice", fractional, "fractional")),
    "supplier" -> Seq(
      ("s_suppkey", integral, "integral"),
      ("s_nationkey", integral, "integral"),
      ("s_acctbal", fractional, "fractional")),
    "nation" -> Seq(
      ("n_nationkey", integral, "integral"),
      ("n_regionkey", integral, "integral"),
      ("n_name", string, "string")),
    "region" -> Seq(
      ("r_regionkey", integral, "integral"),
      ("r_name", string, "string"))
  )

  // --- semantic invariants the stream oracles replay -----------------------
  // Every offset-aligned oracle (log bootstrap offset==event_id, SURVEY §2.1
  // O2; q_stream*/q_tail/q_dense) assumes the driver generates events with
  // DENSE 0..N-1 ids whose global (ts, event_id) order agrees with id order
  // (EventFeed replays by ts; the bootstrap assigns dense arrival offsets).
  // sf1_sweep.sh asserts this on ScaleUp slices; pin it on the driver SFs
  // too — a regeneration that breaks it would otherwise resurface as a wall
  // of unexplained stream-oracle hash mismatches, not a named failure.
  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf: events keep the dense ts-co-ordered id space the offset oracles replay") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val ev = Tables.events(spark, s"/root/testdata/$sf")
      val stats = ev.agg(
        count(lit(1)), min(col("event_id")), max(col("event_id"))).first()
      val n = stats.getLong(0)
      assert(n > 0, "events table is empty")
      assert(stats.getLong(1) == 0L && stats.getLong(2) == n - 1,
        s"event_ids not dense 0..N-1: min=${stats.getLong(1)} max=${stats.getLong(2)} n=$n")
      val disordered = ev
        .withColumn("rn",
          row_number().over(Window.orderBy(col("ts"), col("event_id"))) - 1)
        .where(col("rn") =!= col("event_id")).count()
      assert(disordered == 0L,
        s"$disordered rows where (ts, event_id) order diverges from event_id order — " +
          "every offset-aligned stream oracle would scramble")
    }
  }

  for ((table, cols) <- contract.toSeq.sortBy(_._1)) {
    test(s"$table: driver columns stay within the engine's tolerated type families") {
      // schema-only (parquet footer) — Tables.table so events takes the
      // normalizing ingress like every consumer
      val schema = Tables.table(spark, dir, table).schema
      val problems = cols.flatMap { case (name, ok, family) =>
        schema.fields.find(_.name == name) match {
          case None =>
            Some(s"$table.$name: MISSING (driver regeneration dropped/renamed it)")
          case Some(f) if !ok(f.dataType) =>
            Some(s"$table.$name: ${f.dataType.simpleString} outside tolerated family [$family] " +
              "— extend the adaptive ingress (Tables/queries casts) before trusting any sweep")
          case _ => None
        }
      }
      assert(problems.isEmpty, problems.mkString("\n"))
    }
  }
}
