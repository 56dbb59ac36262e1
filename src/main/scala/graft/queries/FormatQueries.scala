package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * File-format scan/sink coverage beyond parquet (SURVEY §2.2 row 1): CSV
 * and JSON-lines sinks written by the engine and read back through an
 * explicit schema (schema inference is a convenience, not a contract),
 * proving lossless round-trips hash-identical to the source-of-truth
 * oracle. Doubles survive text round-trips via Spark's shortest-repr
 * writer and exact reader; outputs round to 4 anyway per the contract.
 */
object FormatQueries {

  private val roundtripSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def subset(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select("event_id", "user_id", "event_type", "value")

  private val oracleSql =
    """SELECT event_id, user_id, event_type, round(value, 4) AS value
      |FROM events WHERE event_type = 'signup' ORDER BY event_id""".stripMargin

  val all: Seq[Declared] = Seq(
    Declared("q_csv", Some(oracleSql)) { (spark, dir) =>
      val out = graft.ScratchDirs.dir("graft-csv")
      subset(spark, dir).write.mode("overwrite").option("header", "true").csv(out)
      spark.read.schema(roundtripSchema).option("header", "true").csv(out)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")
    },

    Declared("q_jsonfile", Some(oracleSql)) { (spark, dir) =>
      val out = graft.ScratchDirs.dir("graft-json")
      subset(spark, dir).write.mode("overwrite").json(out)
      spark.read.schema(roundtripSchema).json(out)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")
    },

    // ORC round-trip (binary columnar, exact — no text re-parse involved);
    // predicate pushdown works on the read-back side like parquet
    Declared("q_orcfile", Some(oracleSql)) { (spark, dir) =>
      val out = graft.ScratchDirs.dir("graft-orc")
      subset(spark, dir).write.mode("overwrite").orc(out)
      spark.read.schema(roundtripSchema).orc(out)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")
    },

    // Schema evolution: a landing directory whose older files lack a
    // column added later. mergeSchema unions the footers; legacy rows
    // surface NULL for the new column. At 100 TB this read path (schema
    // drift across years of drops) is the rule, not the edge case — the
    // query proves both cohorts aggregate correctly through one scan.
    // The per-cohort totals ride the exact-cents Money convention (value
    // is 2-decimal and so is value*2 — an exact double ×2): 50M-row
    // cohorts at the factor-1000 slice drifted the plain double sum
    // 6e-4 off the oracle (the q_salted class, fifth sweep catch).
    Declared(
      "q_evolve",
      Some(
        """SELECT (event_id % 2 = 0) AS legacy, count(*) AS n,
          |       round(CAST(sum(CAST(CASE WHEN event_id % 2 = 1 THEN value * 2
          |                                ELSE value END AS DECIMAL(18,2))) AS DOUBLE), 4) AS total
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
      )
    ) { (spark, dir) =>
      val out = graft.ScratchDirs.dir("graft-evolve")
      val ev = graft.Tables.events(spark, dir).select("event_id", "value")
      ev.filter(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$out/gen1")
      ev.filter(col("event_id") % 2 === 1)
        .withColumn("value_v2", col("value") * 2) // the evolved column
        .write.mode("overwrite").parquet(s"$out/gen2")
      spark.read.option("mergeSchema", "true")
        .parquet(s"$out/gen1", s"$out/gen2")
        .groupBy(col("value_v2").isNull.as("legacy"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Money.sumMoney(
            coalesce(col("value_v2"), col("value"))), 4).as("total"))
        .orderBy("legacy")
    },

    // Corrupt-record-tolerant ingestion (PERMISSIVE mode): real landing
    // zones contain malformed lines, and a 100 TB load must quarantine
    // them — not die (FAILFAST) and not silently drop them (DROPMALFORMED).
    // Three poisoned lines land in `_corrupt_record`; the good cohort
    // aggregates exactly the source table.
    Declared(
      "q_badrecords",
      Some(
        """SELECT 'corrupt' AS kind, CAST(3 AS BIGINT) AS n, CAST(0 AS BIGINT) AS id_sum
          |UNION ALL
          |SELECT 'ok', count(*), CAST(sum(event_id) AS BIGINT) FROM events
          |ORDER BY kind""".stripMargin
      )
    ) { (spark, dir) =>
      import spark.implicits._
      val out = graft.ScratchDirs.dir("graft-badrec")
      graft.Tables.events(spark, dir).select("event_id", "event_type", "value")
        .write.mode("overwrite").json(s"$out/good")
      Seq("{{{", "not json at all", "[1,2").toDS()
        .write.mode("overwrite").text(s"$out/bad")
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("_corrupt_record", StringType)))
      spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(s"$out/good", s"$out/bad")
        .groupBy(when(col("_corrupt_record").isNull, "ok").otherwise("corrupt").as("kind"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("event_id"), lit(0L))).as("id_sum"))
        .orderBy("kind")
    },

    // XML round-trip (Spark 4 built-in XML source, one <row> element per
    // record). Text re-parse like CSV/JSON; explicit schema on read.
    Declared("q_xmlfile", Some(oracleSql)) { (spark, dir) =>
      val out = graft.ScratchDirs.dir("graft-xml")
      subset(spark, dir).write.mode("overwrite")
        .format("xml").option("rowTag", "row").save(out)
      spark.read.schema(roundtripSchema)
        .format("xml").option("rowTag", "row").load(out)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy("event_id")
    }
  )
}
