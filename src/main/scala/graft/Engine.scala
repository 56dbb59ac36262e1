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

  // last directory registered per session: registering all 10 views costs
  // 10 parquet footer/schema reads, and the SQL-based declared queries
  // each called it per EXECUTION (~500 redundant reads over a 3-pass
  // bench). Views are session-scoped state, so the memo key is the
  // session; a dir change re-registers.
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register every testdata table under its bare name (memoized per
    * session+dir; `force` re-reads the footers, e.g. after overwriting
    * files in place). The check-register-put runs under one lock so two
    * threads can't interleave half-registered view sets. The memo trusts
    * the views it registered: external `dropTempView`/`createOrReplaceTempView`
    * on a table name makes it stale — callers doing that must pass
    * `force = true` (EngineSpec pins both behaviors). */
  def registerViews(spark: SparkSession, dir: String, force: Boolean = false): Unit =
    registeredDir.synchronized {
      if (force || registeredDir.get(spark) != dir) {
        Tables.all.foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(n))
        registeredDir.put(spark, dir)
      }
    }

  /** Run SQL text against the registered views. */
  def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(text)
  }
}
