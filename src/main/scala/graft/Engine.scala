package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The SQL entry point (SURVEY §7 Phase 3's "thin Engine.sql façade"): a
 * user of the engine can run ANSI SQL text directly over the data
 * directory — the tables register as temp views (scan-time pruning and
 * pushdown intact; a view is just a named logical plan) and graft's native
 * expressions (`graft_cosine`, `graft_minhash`, …) are available as SQL
 * functions via the [[GraftExtensions]] injection.
 */
object Engine {

  /** Register every testdata table under its bare name. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(n))

  /** Run SQL text against the registered views. */
  def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(text)
  }
}
