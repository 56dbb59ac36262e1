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
