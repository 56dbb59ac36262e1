package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One declared query: a Spark implementation plus (when SQL-expressible)
 * the equivalent DuckDB SQL the driver runs as the oracle (SURVEY.md §2.3).
 *
 * Contract notes that every query here obeys:
 *  - total `ORDER BY` on both sides (deterministic row order),
 *  - floating-point outputs wrapped in `round(x, 4)` on both sides,
 *  - identical column names on both sides (the driver's compare sorts
 *    columns by name before hashing),
 *  - identical column types where the engines' defaults diverge (e.g.
 *    DuckDB `length()` is BIGINT, Spark's is INT → cast to long).
 */
final case class Declared(
    name: String,
    oracle: Option[String]
)(val run: (SparkSession, String) => DataFrame)
