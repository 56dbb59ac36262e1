package graft.queries

import graft.{Engine, Tables}
import org.apache.spark.sql.functions._

/**
 * The SQL surface end-to-end: the same declared semantics driven through
 * `spark.sql(...)` text via [[graft.Engine]] instead of the DataFrame API —
 * proving a reference user can bring plain SQL (including graft's injected
 * native functions) and get identical results. Catalyst compiles both
 * entries to the same plans; the oracle hash-check proves it.
 */
object SqlQueries {

  val all: Seq[Declared] = Seq(
    // TPC-H Q1 as SQL text through Engine.sql (same oracle as q_tpch1).
    // Deliberately KEEPS the DECIMAL(18,2) money sums after q_tpch1 moved
    // to integer cents (graft.functions.Money): this entry is what still
    // exercises Spark's decimal partial aggregates — the registry covers
    // both exact-money formulations, and the two hash-match each other.
    Declared(
      "q_sql",
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       round(sum(l_quantity), 4) AS sum_qty,
          |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_base_price,
          |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          |                       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS sum_disc_price,
          |       round(avg(l_quantity), 4) AS avg_qty,
          |       count(*) AS n
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT l_returnflag, l_linestatus,
          |       round(sum(l_quantity), 4) AS sum_qty,
          |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_base_price,
          |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          |                       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS sum_disc_price,
          |       round(avg(l_quantity), 4) AS avg_qty,
          |       count(*) AS n
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },

    // user-registered Scala UDF through the SQL surface (the UDF registry
    // row of §2.2 — for anything a built-in or native expression already
    // covers, those win on codegen; this pins the extension path itself)
    Declared(
      "q_udf",
      Some(
        """SELECT event_id, reverse(event_type) AS rev,
          |       length(event_type) * CAST(user_id AS BIGINT) AS weighted
          |FROM events ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      // register-if-absent: the bench replays every query 3× in one session
      // and an unconditional register logs "replaced a previously registered
      // function" per pass
      if (!spark.catalog.functionExists("graft_reverse"))
        spark.udf.register("graft_reverse", (s: String) => s.reverse)
      if (!spark.catalog.functionExists("graft_weight"))
        spark.udf.register("graft_weight", (s: String, u: Long) => s.length * u)
      Engine.sql(spark, dir,
        """SELECT event_id, graft_reverse(event_type) AS rev,
          |       graft_weight(event_type, user_id) AS weighted
          |FROM events ORDER BY event_id""".stripMargin)
    },

    // cosine top-10 as SQL text calling the extension-injected native
    // codegen function graft_cosine (same oracle as q_sim)
    Declared(
      "q_sql_sim",
      Some(
        """WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0),
          |sims AS (
          |  SELECT e.vec_id,
          |         list_dot_product(CAST(e.embedding AS DOUBLE[]), p.p)
          |           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
          |              * sqrt(list_dot_product(p.p, p.p))) AS sim
          |  FROM embeddings e CROSS JOIN probe p)
          |SELECT vec_id, round(sim, 4) AS sim FROM sims
          |ORDER BY round(sim, 4) DESC, vec_id LIMIT 10""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT e.vec_id, round(graft_cosine(e.embedding, p.p), 4) AS sim
          |FROM embeddings e
          |CROSS JOIN (SELECT embedding AS p FROM embeddings WHERE vec_id = 0) p
          |ORDER BY round(graft_cosine(e.embedding, p.p), 4) DESC, e.vec_id
          |LIMIT 10""".stripMargin)
    },

    // LATERAL correlated subquery (per-customer top-2 orders): the
    // correlated-inner-loop surface SQL users expect; Catalyst decorrelates
    // the lateral into a join + WindowGroupLimit-style per-key limit rather
    // than executing the inner query per outer row. Big-spender cut keeps
    // the checked output small at any SF.
    Declared(
      "q_lateral",
      Some(
        """SELECT c_custkey, o_orderkey, round(o_totalprice, 4) AS price
          |FROM customer c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |WHERE c_acctbal > 9000
          |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT c_custkey, o_orderkey, round(o_totalprice, 4) AS price
          |FROM customer c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |WHERE c_acctbal > 9000
          |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin)
    },

    // Join-strategy hint surface: SHUFFLE_HASH forces a shuffled hash join
    // where the planner would broadcast — the manual override a 100 TB user
    // reaches for when the "small" side won't fit executor memory (or,
    // inverted, NO_BROADCAST_HASH/MERGE when broadcast would OOM the
    // driver). The hint is a standard block comment, so the IDENTICAL text
    // runs as the DuckDB oracle. Hint honored = pinned in PlanSpec.
    Declared(
      "q_hint",
      Some(
        """SELECT /*+ SHUFFLE_HASH(c) */ c_mktsegment,
          |       count(*) AS n, round(sum(o_totalprice) / 1000000.0, 2) AS rev_m
          |FROM customer c JOIN orders o ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT /*+ SHUFFLE_HASH(c) */ c_mktsegment,
          |       count(*) AS n, round(sum(o_totalprice) / 1000000.0, 2) AS rev_m
          |FROM customer c JOIN orders o ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    },

    // ANSI-mode safety surface (Spark 4 defaults ANSI on, so x/0 and bad
    // casts THROW): try_divide/try_cast are the per-row quarantine —
    // NULL instead of a job-killing exception 40 TB into a scan. DuckDB's
    // native semantics (NULL on /0, TRY_CAST) mirror them exactly.
    Declared(
      "q_try",
      Some(
        """SELECT event_id,
          |       round(value / CAST(event_id % 5 AS DOUBLE), 4) AS ratio,
          |       CAST(TRY_CAST(CASE WHEN event_id % 2 = 0 THEN '42'
          |                          ELSE event_type END AS INTEGER) AS BIGINT) AS parsed
          |FROM events ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT event_id,
          |       round(try_divide(value, CAST(event_id % 5 AS DOUBLE)), 4) AS ratio,
          |       CAST(try_cast(CASE WHEN event_id % 2 = 0 THEN '42'
          |                          ELSE event_type END AS INT) AS BIGINT) AS parsed
          |FROM events ORDER BY event_id""".stripMargin)
    },

    // Time-based RANGE window frame (q_winframe covers ROWS frames): the
    // trailing-1-hour sliding aggregate per user — "activity in the last
    // hour at each event" — where the frame is defined by event-TIME
    // distance, not row count. One user-keyed sort-window shuffle;
    // identical text runs on both engines.
    Declared(
      "q_rangeframe",
      Some(
        """SELECT event_id, user_id,
          |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
          |       round(sum(value) OVER w, 4) AS sum_1h
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT event_id, user_id,
          |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
          |       round(sum(value) OVER w, 4) AS sum_1h
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    },

    // LOCF gap-filling (last observation carried forward): sensor-style
    // sparse readings forward-filled per user with last_value IGNORE NULLS
    // — the standard time-series repair before windowed aggregation.
    // Sparsity is engineered (every 5th event carries a reading); the fill
    // is one user-keyed sort-window shuffle. Identical text both engines.
    Declared(
      "q_locf",
      Some(
        """SELECT event_id, user_id,
          |       round(last_value(CASE WHEN event_id % 5 = 0 THEN value END IGNORE NULLS)
          |               OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS filled
          |FROM events ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      // Spark spells null-skipping as last_value(expr, true); DuckDB as
      // last_value(expr IGNORE NULLS) — same semantics, dialect spellings
      Engine.sql(spark, dir,
        """SELECT event_id, user_id,
          |       round(last_value(CASE WHEN event_id % 5 = 0 THEN value END, true)
          |               OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS filled
          |FROM events ORDER BY event_id""".stripMargin)
    },

    // Correlated scalar subquery in the SELECT list (q_scalarsub covers the
    // uncorrelated broadcast form): per-customer max order value inline.
    // Catalyst decorrelates to aggregate + left outer join — one pass over
    // orders, NOT one subquery execution per customer row.
    Declared(
      "q_corrsub",
      Some(
        """SELECT c_custkey,
          |       round(coalesce((SELECT max(o_totalprice) FROM orders o
          |                       WHERE o.o_custkey = c.c_custkey), 0), 4) AS max_order
          |FROM customer c
          |WHERE c_acctbal > 9000
          |ORDER BY c_custkey""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT c_custkey,
          |       round(coalesce((SELECT max(o_totalprice) FROM orders o
          |                       WHERE o.o_custkey = c.c_custkey), 0), 4) AS max_order
          |FROM customer c
          |WHERE c_acctbal > 9000
          |ORDER BY c_custkey""".stripMargin)
    },

    // NOT IN three-valued logic — the classic silent-wrong-answer trap: if
    // the subquery produces ANY NULL, `x NOT IN (...)` is never TRUE and
    // the result is empty. The ORACLE runs the literal NOT IN, so the
    // standard's semantics stay pinned; the SPARK side implements the
    // three-valued rules EXPLICITLY (null-probe rule + list-null rule +
    // shuffled anti join) because Spark's own NOT IN plan is a null-aware
    // anti join that can ONLY broadcast — at the factor-1000 slice the
    // 150M-key list blew the 8 GiB broadcast cap (the sweep's fourth
    // catch). A wrong explicit rule here would hash-mismatch the oracle.
    Declared(
      "q_notin",
      Some(
        """SELECT
          |  (SELECT CAST(count(*) AS BIGINT) FROM customer
          |   WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)) AS never_ordered,
          |  (SELECT CAST(count(*) AS BIGINT) FROM customer
          |   WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
          |                                       ELSE o_custkey END FROM orders)) AS null_poisoned""".stripMargin
      )
    ) { (spark, dir) =>
      val custAll = Tables.customer(spark, dir)
      val cust    = custAll.where(col("c_custkey").isNotNull)
      val ord     = Tables.orders(spark, dir)
      // null-free list: NOT IN ≡ anti join on the distinct keys, minus
      // NULL probes (a NULL x is never TRUE under NOT IN a non-empty list)
      val keys1 = ord.where(col("o_custkey").isNotNull)
        .select(col("o_custkey").as("k1")).distinct()
      val never = cust.join(keys1, col("c_custkey") === col("k1"), "left_anti")
        .agg(count(lit(1)).as("never_cnt"))
      // poisoned list: anti join against the list's NON-NULL keys, then
      // zero the count when the list contains ANY NULL (one NULL makes
      // NOT IN never TRUE for every probe) — all declarative, so the
      // whole query is one plan with two shuffled LeftAnti joins and
      // four 1-row broadcast combines
      val caseKey = when(col("o_orderkey") % 100 === 0, lit(null))
        .otherwise(col("o_custkey"))
      val keys2 = ord.select(caseKey.as("k2")).where(col("k2").isNotNull).distinct()
      val pois = cust.join(keys2, col("c_custkey") === col("k2"), "left_anti")
        .agg(count(lit(1)).as("pois_cnt"))
      // list-shape stats for the remaining three-valued edges (coalesce:
      // aggregates over an EMPTY orders table go NULL): l1_cnt/l2_cnt = 0
      // means the respective list is EMPTY, where the standard says NOT IN
      // is TRUE for EVERY probe — NULL probes included (ADVICE r10: the
      // pre-filtered NULL probes must be added back in exactly that case);
      // has_null = 1 means one list NULL makes NOT IN never TRUE.
      val listStats = ord.agg(
        count(when(col("o_custkey").isNotNull, 1)).as("l1_cnt"),
        count(lit(1)).as("l2_cnt"),
        coalesce(max(when(col("o_orderkey") % 100 === 0 || col("o_custkey").isNull, 1)
          .otherwise(0)), lit(0)).as("has_null"))
      val nullProbes = custAll.agg(
        count(when(col("c_custkey").isNull, 1)).as("null_probes"))
      never.crossJoin(broadcast(pois)).crossJoin(broadcast(listStats))
        .crossJoin(broadcast(nullProbes))
        .select(
          (col("never_cnt") +
            when(col("l1_cnt") === 0, col("null_probes")).otherwise(lit(0)))
            .cast("long").as("never_ordered"),
          when(col("l2_cnt") === 0, col("pois_cnt") + col("null_probes"))
            .otherwise(col("pois_cnt") * (lit(1) - col("has_null")))
            .cast("long").as("null_poisoned"))
    },

    // Ordered-set aggregates (WITHIN GROUP): listagg with a deterministic
    // ORDER BY (Spark 4) and interpolated percentile_cont — the ANSI
    // spellings of ordered string aggregation and continuous quantiles.
    // DuckDB spells the first string_agg(… ORDER BY …); same semantics.
    Declared(
      "q_withingroup",
      Some(
        """SELECT event_type,
          |       string_agg(DISTINCT CAST(user_id % 5 AS VARCHAR), ','
          |                  ORDER BY CAST(user_id % 5 AS VARCHAR)) AS cohorts,
          |       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS med
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT event_type,
          |       listagg(DISTINCT CAST(user_id % 5 AS STRING), ',')
          |         WITHIN GROUP (ORDER BY CAST(user_id % 5 AS STRING)) AS cohorts,
          |       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS med
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // mode(): the last §2.2 scalar-aggregate residual. Spark 4's ordered
    // variant `mode() WITHIN GROUP (ORDER BY k)` breaks frequency ties by
    // taking the smallest value, which makes the result deterministic;
    // the oracle replays that exact tie-break with a count + row_number
    // (ORDER BY cnt DESC, cohort ASC) since DuckDB's own mode() leaves
    // ties unspecified. Plan-wise this is an ordinary partial→final hash
    // aggregate on event_type — no extra shuffle over a plain count.
    Declared(
      "q_mode",
      Some(
        """WITH c AS (SELECT event_type, user_id % 10 AS cohort, count(*) AS cnt
          |           FROM events GROUP BY 1, 2),
          |r AS (SELECT event_type, cohort,
          |             row_number() OVER (PARTITION BY event_type
          |                                ORDER BY cnt DESC, cohort) AS rn
          |      FROM c)
          |SELECT r.event_type, r.cohort AS modal_cohort, t.n
          |FROM r JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n
          |             FROM events GROUP BY 1) t USING (event_type)
          |WHERE rn = 1 ORDER BY event_type""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """SELECT event_type,
          |       mode() WITHIN GROUP (ORDER BY user_id % 10) AS modal_cohort,
          |       CAST(count(*) AS BIGINT) AS n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // Null-safe equality join: Spark's <=> / DuckDB's IS NOT DISTINCT FROM.
    // With plain `=` the NULL cohort silently vanishes from the join — the
    // classic silent-data-loss bug in key-nullable joins; null-safe
    // equality keeps it as a first-class group. Still hash-partitionable
    // (NULL is one key), so the plan stays a normal equi-join at scale.
    Declared(
      "q_nullsafe",
      Some(
        """WITH f AS (SELECT CASE WHEN event_id % 7 = 0 THEN NULL
          |                       ELSE user_id % 100 END AS k FROM events),
          |d AS (SELECT DISTINCT k FROM f)
          |SELECT d.k, CAST(count(*) AS BIGINT) AS n
          |FROM d JOIN f ON d.k IS NOT DISTINCT FROM f.k
          |GROUP BY d.k ORDER BY d.k""".stripMargin
      )
    ) { (spark, dir) =>
      Engine.sql(spark, dir,
        """WITH f AS (SELECT CASE WHEN event_id % 7 = 0 THEN NULL
          |                       ELSE user_id % 100 END AS k FROM events),
          |d AS (SELECT DISTINCT k FROM f)
          |SELECT d.k, CAST(count(*) AS BIGINT) AS n
          |FROM d JOIN f ON d.k <=> f.k
          |GROUP BY d.k ORDER BY d.k""".stripMargin)
    },

    // WITH RECURSIVE (Spark 4 recursive CTE): calendar-fill — generate the
    // January-1995 date spine recursively (31 driver-coordinated iterations
    // of a 1-row frontier; ≤ the 100-level recursion limit), then LEFT JOIN
    // orders so zero-order days survive with 0 revenue. At scale the spine
    // is tiny and broadcasts; the fact side stays a pruned scan.
    Declared(
      "q_recursive",
      Some(
        """WITH RECURSIVE days(d) AS (
          |  SELECT DATE '1995-01-01'
          |  UNION ALL
          |  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM days
          |  WHERE d < DATE '1995-01-31'
          |)
          |SELECT d, count(o_orderkey) AS n_orders,
          |       round(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE), 4) AS revenue
          |FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
          |GROUP BY d ORDER BY d""".stripMargin
      )
    ) { (spark, dir) =>
      // revenue through exact integer cents (the Money convention): a
      // double-accumulated sum drifted 1e-4 at the factor-100 scale where
      // per-day groups reach 8000 orders
      Engine.sql(spark, dir,
        """WITH RECURSIVE days(d) AS (
          |  SELECT DATE '1995-01-01'
          |  UNION ALL
          |  SELECT date_add(d, 1) FROM days
          |  WHERE d < DATE '1995-01-31'
          |)
          |SELECT d, count(o_orderkey) AS n_orders,
          |       round(coalesce(sum(cast(bround(o_totalprice * 100) as bigint)), 0) / cast(100 as double), 4) AS revenue
          |FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
          |GROUP BY d ORDER BY d""".stripMargin)
    }
  )
}
