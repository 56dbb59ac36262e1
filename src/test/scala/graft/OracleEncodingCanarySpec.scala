package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The ORACLE-side half of the testdata-encoding canary (VERDICT r09
 * item 8). TsEncodingSpec/TestdataContractSpec pin what THIS engine
 * decodes from the driver parquet; correctness, though, is a three-party
 * agreement — driver files, this engine, and the driver's DuckDB oracle.
 * A DuckDB version bump in the driver harness that changes how an
 * encoding decodes (the ns-vs-µs timestamp class, BYTE_ARRAY vs
 * dictionary strings) would today surface as a wall of hash mismatches
 * with both engines individually "green". This spec runs the SAME DuckDB
 * the harness uses (the container's python3 module — the existing oracle
 * runner's engine) over a 10-row slice per driver table and compares its
 * decode against Spark's on EXACT integer/string canonical forms, so the
 * divergence fails one named test instead.
 *
 * Skips (scalatest `assume`) when python3/duckdb is unavailable — the
 * canary targets the driver harness environment, where it always is.
 */
class OracleEncodingCanarySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Run a python3 snippet; None when python3 or duckdb is missing. */
  private def python(script: String): Option[String] = {
    import scala.sys.process._
    val out = new StringBuilder
    val err = new StringBuilder
    try {
      val code = Process(Seq("python3", "-c", script))
        .!(ProcessLogger(l => out.append(l).append('\n'), l => err.append(l).append('\n')))
      if (code == 0) Some(out.toString)
      else if (err.toString.contains("ModuleNotFoundError")) None
      else fail(s"oracle canary python failed (exit $code):\n$err")
    } catch { case _: java.io.IOException => None } // no python3 at all
  }

  /** Key column per table (lowest 10 keys = the deterministic slice). */
  private val keyCols = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  test("DuckDB decodes the events ts encoding to the same instants Spark does") {
    // exact integer compare: unix µs of the 10 lowest event_ids, plus the
    // min/max year window (the unit-drift trap: a harness DuckDB that
    // starts reading this encoding at a different unit lands centuries
    // away; one that shifts epoch/zone lands off by hours — both caught)
    val duck = python(
      s"""import duckdb
         |r = duckdb.connect().execute(
         |  "SELECT event_id, CAST(epoch_us(ts) AS BIGINT) FROM '$dir/events.parquet' "
         |  "ORDER BY event_id LIMIT 10").fetchall()
         |print(';'.join(f'{a}:{b}' for a, b in r))
         |y = duckdb.connect().execute(
         |  "SELECT min(year(ts)), max(year(ts)) FROM '$dir/events.parquet'").fetchone()
         |print(f'{y[0]}..{y[1]}')
         |""".stripMargin)
    assume(duck.isDefined, "python3/duckdb unavailable — not the driver harness environment")
    val Array(pairs, years) = duck.get.trim.split('\n')
    val sparkPairs = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")))
      .orderBy("event_id").limit(10).collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(";")
    assert(pairs === sparkPairs,
      "DuckDB and Spark decode the events ts encoding to DIFFERENT instants — " +
        "driver harness DuckDB drift; every ts-bearing oracle hash is suspect")
    val Array(minY, maxY) = years.split("\\.\\.").map(_.toInt)
    assert(minY >= 1990 && maxY <= 2100,
      s"DuckDB-decoded ts years [$minY, $maxY] outside the plausible corpus window")
  }

  test("DuckDB reads every driver table's key + row count identically to Spark") {
    // per-table: total row count and the 10 lowest keys — integral columns,
    // so the compare is exact. A dropped/renamed key column, a changed
    // compression DuckDB can't read, or a row-group decode divergence all
    // land here by table name.
    val tables = Tables.all
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |for t, k in ${tables.map(t => s"('$t','${keyCols(t)}')").mkString("[", ",", "]")}:
         |    n = con.execute(f"SELECT count(*) FROM '$dir/{t}.parquet'").fetchone()[0]
         |    ks = con.execute(
         |        f"SELECT CAST({k} AS BIGINT) FROM '$dir/{t}.parquet' ORDER BY 1 LIMIT 10"
         |    ).fetchall()
         |    print(f"{t}|{n}|{','.join(str(x[0]) for x in ks)}")
         |""".stripMargin
    val duck = python(script)
    assume(duck.isDefined, "python3/duckdb unavailable — not the driver harness environment")
    val duckLines = duck.get.trim.linesIterator.toSeq.sorted
    val sparkLines = tables.map { t =>
      val df = Tables.table(spark, dir, t)
      val k  = keyCols(t)
      val n  = df.count()
      val ks = df.select(col(k).cast("long")).orderBy(col(k).cast("long"))
        .limit(10).collect().map(_.getLong(0)).mkString(",")
      s"$t|$n|$ks"
    }.sorted
    assert(duckLines === sparkLines,
      "DuckDB and Spark disagree on a driver table's rows/keys — oracle-side drift")
  }
}
