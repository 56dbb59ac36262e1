package graft.queries

import graft.Tables
import graft.functions.Money
import org.apache.spark.sql.functions._

/**
 * Second-round relational coverage: the §2.2 rows whose ALL/outer/subquery
 * variants round 1 left implicit — multiset set-ops, outer joins, scalar
 * subqueries, exact quantiles, deterministic hash sampling, ordered
 * collect, conditional/argmin-argmax aggregates, string/date scalar
 * functions, positional explode, VARIANT JSON, theta joins, and an
 * explicitly salted two-phase aggregation (the skew-mitigation shape,
 * hash-proven equal to the plain aggregate).
 *
 * Scale notes: every query is shuffle-minimal — set ops hash-partition on
 * the row, outer joins are dimension-broadcast or AQE-planned, the scalar
 * subquery is a 1-row broadcast crossJoin (never a driver collect), the
 * salted aggregate is the canonical hot-key split (partial agg on
 * (key, salt), final agg on key).
 */
object CoverageQueries {

  val all: Seq[Declared] = Seq(
    // MapType surface: build a per-user event_type→count map from sorted
    // entries (deterministic iteration order), then read it back with
    // element_at / size. The map itself never reaches the output (the
    // driver compare can't hash a map cell); its ACCESSES do, and the
    // oracle re-derives them relationally — proving construction + lookup.
    Declared(
      "q_map",
      Some(
        """SELECT user_id,
          |       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
          |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
          |FROM events GROUP BY user_id
          |HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
          |ORDER BY user_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt")))))
          .as("m"))
        .select(
          col("user_id"),
          element_at(col("m"), "purchase").as("n_purchase"),
          size(col("m")).cast("long").as("n_types"))
        .where(col("n_purchase").isNotNull)
        .orderBy("user_id")
    },

    // Array SET operations (the §2.2 array category beyond HOFs): distinct
    // token vocab per adjacent-doc pair, sorted set intersection joined to
    // a string (the driver compare can't hash array cells), union/overlap
    // sizes. Self-join on doc_id+1 is a narrow co-partitioned equi-join.
    Declared(
      "q_arrayops",
      Some(
        """WITH t AS (SELECT doc_id,
          |                  list_distinct(regexp_split_to_array(text, ' +')) AS toks
          |           FROM documents)
          |SELECT a.doc_id,
          |       CAST(len(a.toks) AS BIGINT) AS n_a,
          |       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_common,
          |       array_to_string(list_sort(list_intersect(a.toks, b.toks)), ',') AS common
          |FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
          |WHERE a.doc_id % 50 = 0
          |ORDER BY a.doc_id""".stripMargin
      )
    ) { (spark, dir) =>
      val toks = array_distinct(split(col("text"), " +"))
      val t = Tables.documents(spark, dir).select(col("doc_id"), toks.as("toks"))
      val a = t.as("a")
      val b = t.select(col("doc_id").as("bid"), col("toks").as("btoks"))
      a.join(b, col("bid") === col("doc_id") + 1)
        .where(col("doc_id") % 50 === 0)
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_a"),
          size(array_intersect(col("toks"), col("btoks"))).cast("long").as("n_common"),
          array_join(array_sort(array_intersect(col("toks"), col("btoks"))), ",").as("common"))
        .orderBy("doc_id")
    },

    // GROUP BY ALL / ORDER BY ALL (the modern SQL ergonomics both engines
    // share): every non-aggregate select item becomes a grouping key.
    // avg_value follows the q_agg convention — exact DECIMAL total, one
    // division, unrounded double — so the cohorts (which grow linearly
    // with data: user_id % 10) can never drift the double sum or land a
    // round(,4) on a cross-engine half boundary. The IDENTICAL SQL text
    // runs on both engines.
    Declared(
      "q_groupall",
      Some(
        """SELECT event_type, user_id % 10 AS cohort, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
          |FROM events GROUP BY ALL ORDER BY ALL""".stripMargin
      )
    ) { (spark, dir) =>
      graft.Engine.sql(spark, dir,
        """SELECT event_type, user_id % 10 AS cohort, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
          |FROM events GROUP BY ALL ORDER BY ALL""".stripMargin)
    },

    // UNION ALL — multiset union, no dedup shuffle at all (a pure narrow
    // concat of the two scans; compare q_union's distinct variant)
    Declared(
      "q_union_all",
      Some(
        """SELECT user_id FROM events WHERE event_type = 'signup'
          |UNION ALL
          |SELECT user_id FROM events WHERE event_type = 'click'
          |ORDER BY user_id""".stripMargin
      )
    ) { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      ev.filter(col("event_type") === "signup").select("user_id")
        .union(ev.filter(col("event_type") === "click").select("user_id"))
        .orderBy("user_id")
    },

    // INTERSECT ALL — multiset intersection (min of per-side multiplicities)
    Declared(
      "q_intersect_all",
      Some(
        """SELECT user_id FROM events WHERE event_type = 'click'
          |INTERSECT ALL
          |SELECT user_id FROM events WHERE event_type = 'view'
          |ORDER BY user_id""".stripMargin
      )
    ) { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      ev.filter(col("event_type") === "click").select("user_id")
        .intersectAll(ev.filter(col("event_type") === "view").select("user_id"))
        .orderBy("user_id")
    },

    // EXCEPT ALL — multiset difference (multiplicity subtraction)
    Declared(
      "q_except_all",
      Some(
        """SELECT user_id FROM events WHERE event_type = 'click'
          |EXCEPT ALL
          |SELECT user_id FROM events WHERE event_type = 'view'
          |ORDER BY user_id""".stripMargin
      )
    ) { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      ev.filter(col("event_type") === "click").select("user_id")
        .exceptAll(ev.filter(col("event_type") === "view").select("user_id"))
        .orderBy("user_id")
    },

    // LEFT OUTER join preserving customers with zero orders; count(key)
    // ignores the null-extended side, totals coalesce to 0
    Declared(
      "q_leftjoin",
      Some(
        """SELECT c_custkey, count(o_orderkey) AS n_orders,
          |       round(coalesce(sum(o_totalprice), 0), 4) AS total
          |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0)), 4).as("total"))
        .orderBy("c_custkey")
    },

    // FULL OUTER join of two aggregated views (per-day purchase vs error
    // volume) — both sides reduced before the join, so the outer join is
    // tiny regardless of fact scale
    Declared(
      "q_fullouter",
      Some(
        """WITH p AS (SELECT date_trunc('day', ts) AS d, count(*) AS purchases
          |           FROM events WHERE event_type = 'purchase' GROUP BY 1),
          |     e AS (SELECT date_trunc('day', ts) AS d, count(*) AS errors
          |           FROM events WHERE event_type = 'error' GROUP BY 1)
          |SELECT coalesce(p.d, e.d) AS d,
          |       coalesce(purchases, 0) AS purchases,
          |       coalesce(errors, 0) AS errors
          |FROM p FULL OUTER JOIN e ON p.d = e.d
          |ORDER BY d""".stripMargin
      )
    ) { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(date_trunc("day", col("ts")).as("pd"))
        .agg(count(lit(1)).as("purchases"))
      val e = ev.filter(col("event_type") === "error")
        .groupBy(date_trunc("day", col("ts")).as("ed"))
        .agg(count(lit(1)).as("errors"))
      p.join(e, col("pd") === col("ed"), "full_outer")
        .select(
          coalesce(col("pd"), col("ed")).as("d"),
          coalesce(col("purchases"), lit(0)).as("purchases"),
          coalesce(col("errors"), lit(0)).as("errors"))
        .orderBy("d")
    },

    // scalar subquery: orders ≥2× the global mean price. The 1-row global
    // aggregate is broadcast into the scan predicate (no driver round-trip,
    // no recompute per row). The mean goes through the exact-cents total
    // (a double avg's accumulation-order noise shifts BOTH the row set at
    // the 2×mean filter and the ratio's round(,4) bucket once the corpus
    // is large enough); with an identical exact mean on both engines the
    // raw ratio double is bit-identical, so it ships unrounded.
    Declared(
      "q_scalarsub",
      Some(
        """SELECT o_orderkey,
          |       o_totalprice / (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |                              / count(*) FROM orders) AS ratio
          |FROM orders
          |WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |                                 / count(*) FROM orders)
          |ORDER BY o_orderkey""".stripMargin
      )
    ) { (spark, dir) =>
      val orders = Tables.orders(spark, dir)
      val mean = orders.agg(
        (Money.sumMoney(col("o_totalprice")) / count(lit(1))).as("mean_price"))
      orders
        .crossJoin(broadcast(mean))
        .where(col("o_totalprice") > lit(2) * col("mean_price"))
        .select(
          col("o_orderkey"),
          (col("o_totalprice") / col("mean_price")).as("ratio"))
        .orderBy("o_orderkey")
    },

    // exact interpolated quantiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`: both linear interpolation over the sorted set)
    Declared(
      "q_quantile",
      Some(
        """SELECT event_type,
          |       round(quantile_cont(value, 0.25), 4) AS p25,
          |       round(quantile_cont(value, 0.5), 4) AS p50,
          |       round(quantile_cont(value, 0.9), 4) AS p90
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          round(percentile(col("value"), lit(0.25)), 4).as("p25"),
          round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.9)), 4).as("p90"))
        .orderBy("event_type")
    },

    // deterministic hash sampling — the scale-out alternative to
    // TABLESAMPLE (engine-RNG samples can't be oracle-compared; an md5
    // bucket predicate is reproducible everywhere, ~1/16 rate here)
    Declared(
      "q_sample",
      Some(
        """SELECT event_id, user_id, event_type FROM events
          |WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
          |ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .where(substring(md5(col("event_id").cast("string")), 1, 1) === "0")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    },

    // unpivot/melt (wide → long): the Dataset.unpivot API; oracle spells
    // the same reshape as a UNION ALL (engine-neutral)
    Declared(
      "q_unpivot",
      Some(
        """SELECT * FROM (
          |  SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, round(l_discount, 4) AS val
          |  FROM lineitem WHERE l_orderkey <= 100
          |  UNION ALL
          |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', round(l_extendedprice, 4)
          |  FROM lineitem WHERE l_orderkey <= 100
          |  UNION ALL
          |  SELECT l_orderkey, l_linenumber, 'l_quantity', round(l_quantity, 4)
          |  FROM lineitem WHERE l_orderkey <= 100)
          |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .where(col("l_orderkey") <= 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_discount"), col("l_extendedprice"), col("l_quantity")),
          "metric", "val")
        .withColumn("val", round(col("val"), 4))
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },

    // lead — the forward-looking analytic (lag's mirror, q_lag covers the
    // backward frame): next event's gap per user
    Declared(
      "q_lead",
      Some(
        """SELECT user_id, event_id,
          |       lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS next_id
          |FROM events ORDER BY user_id, event_id""".stripMargin
      )
    ) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          lead(col("event_id"), 1).over(w).as("next_id"))
        .orderBy("user_id", "event_id")
    },

    // correlated EXISTS / NOT EXISTS — the subquery shapes Catalyst
    // rewrites into semi/anti joins with the correlation as the join key
    // (same physical plan family as q_semi/q_anti, reached from the
    // correlated-subquery surface instead of IN)
    Declared(
      "q_exists",
      Some(
        """SELECT c_custkey, c_mktsegment FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 10000)
          |ORDER BY c_custkey""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.customer(spark, dir).createOrReplaceTempView("graft_exists_customer")
      Tables.orders(spark, dir).createOrReplaceTempView("graft_exists_orders")
      spark.sql(
        """SELECT c_custkey, c_mktsegment FROM graft_exists_customer c
          |WHERE EXISTS (SELECT 1 FROM graft_exists_orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          |  AND NOT EXISTS (SELECT 1 FROM graft_exists_orders o
          |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 10000)
          |ORDER BY c_custkey""".stripMargin)
    },

    // MERGE/upsert pattern (Delta-style MERGE without a table format):
    // matched keys update the dimension (balance += spend), unmatched
    // update keys insert synthesized rows, untouched dimension rows pass
    // through — one full-outer join + coalesce projection, the standard
    // SCD-1 shape. At scale both sides shuffle once on the merge key.
    Declared(
      "q_upsert",
      Some(
        """WITH upd AS (
          |  SELECT CASE WHEN o_custkey % 10 = 0 THEN o_custkey + 1000000
          |              ELSE o_custkey END AS key,
          |         round(sum(o_totalprice), 4) AS spent
          |  FROM orders GROUP BY 1)
          |SELECT coalesce(c.c_custkey, u.key) AS c_custkey,
          |       coalesce(c.c_name, 'new-' || CAST(u.key AS VARCHAR)) AS c_name,
          |       round(coalesce(c.c_acctbal, 0) + coalesce(u.spent, 0), 4) AS balance
          |FROM customer c FULL OUTER JOIN upd u ON c.c_custkey = u.key
          |ORDER BY c_custkey""".stripMargin
      )
    ) { (spark, dir) =>
      val upd = Tables.orders(spark, dir)
        .groupBy(
          when(col("o_custkey") % 10 === 0, col("o_custkey") + 1000000)
            .otherwise(col("o_custkey")).as("key"))
        .agg(round(sum("o_totalprice"), 4).as("spent"))
      Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_acctbal")
        .join(upd, col("c_custkey") === col("key"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("key")).as("c_custkey"),
          coalesce(col("c_name"), concat(lit("new-"), col("key").cast("string"))).as("c_name"),
          round(coalesce(col("c_acctbal"), lit(0)) + coalesce(col("spent"), lit(0)), 4).as("balance"))
        .orderBy("c_custkey")
    },

    // stratified sampling (sampleBy semantics, deterministic): per-stratum
    // rates — purchases kept at ~50%, everything else at ~12.5% — via an
    // md5 bucket predicate reproducible in any engine (engine-RNG sampleBy
    // can't be oracle-compared). The curation move for class rebalancing
    // at corpus scale: a narrow codegen'd filter, no shuffle.
    Declared(
      "q_stratified",
      Some(
        """SELECT event_id, event_type, user_id FROM events
          |WHERE (event_type = 'purchase'
          |         AND substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
          |             IN ('0','1','2','3','4','5','6','7'))
          |   OR (event_type <> 'purchase'
          |         AND substring(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0','1'))
          |ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      val bucket = substring(md5(col("event_id").cast("string")), 1, 1)
      Tables.events(spark, dir)
        .where(
          (col("event_type") === "purchase" && bucket.isin("0","1","2","3","4","5","6","7")) ||
          (col("event_type") =!= "purchase" && bucket.isin("0","1")))
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    },

    // range-clustered layout: repartitionByRange + sortWithinPartitions on
    // the read key before writing — every parquet row group holds a tight
    // contiguous key range, so a key-range predicate prunes to ~1 of 8
    // files via footer min/max stats instead of scanning the table. The
    // write-side half of partition pruning at 100 TB.
    Declared(
      "q_clusterby",
      Some(
        """SELECT event_id, user_id, round(value, 4) AS value FROM events
          |WHERE event_id BETWEEN 2000 AND 2999 ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      val out = graft.ScratchDirs.dir("graft-cluster")
      Tables.events(spark, dir)
        .select("event_id", "user_id", "value")
        .repartitionByRange(8, col("event_id"))
        .sortWithinPartitions("event_id")
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
        .where(col("event_id").between(2000, 2999))
        .select(col("event_id"), col("user_id"), round(col("value"), 4).as("value"))
        .orderBy("event_id")
    },

    // grouped top-K (top-3 events per user by value): declared with the
    // standard rank-filter window idiom ON PURPOSE — Catalyst's
    // InferWindowGroupLimit rewrites it to WindowGroupLimitExec, a bounded
    // per-partition top-k heap BELOW the window sort (partial before the
    // exchange, final after), so per-group data entering the sort is ≤ k
    // rows, not the full group. PlanSpec pins the rewrite; hand-building a
    // custom heap operator would duplicate this built-in (SURVEY §7's
    // custom-vs-builtin ledger: prefer the optimizer's own rewrite).
    Declared(
      "q_topkgroup",
      Some(
        """WITH r AS (
          |  SELECT user_id, event_id, value,
          |         row_number() OVER (PARTITION BY user_id
          |                            ORDER BY value DESC, event_id) AS rn
          |  FROM events)
          |SELECT user_id, event_id, round(value, 4) AS value, rn
          |FROM r WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin
      )
    ) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), round(col("value"), 4).as("value"), col("rn"))
        .orderBy("user_id", "rn")
    },

    // weighted sampling (Efraimidis–Spirakis A-ES): per-item key
    // ln(u)/w with u uniform and w = n_chars; the k largest keys per
    // stratum are a weight-proportional sample WITHOUT replacement — the
    // sampler a curation pipeline uses to over-sample long documents.
    // u comes from a deterministic Knuth multiplicative hash of doc_id
    // (engine-RNG samples can't be oracle-compared; same trick as
    // q_sample's md5 bucket). One window shuffle on lang; at 100 TB the
    // same key + TakeOrdered per stratum needs no global sort.
    Declared(
      "q_weighted",
      Some(
        """WITH s AS (
          |  SELECT doc_id, lang, n_chars,
          |         ln(((doc_id % 1000003) * (2654435761 % 1000003) % 1000003 + 1) / 1000004.0) / n_chars AS k
          |  FROM documents),
          |r AS (SELECT doc_id, lang, n_chars,
          |             row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rn
          |      FROM s)
          |SELECT lang, doc_id, n_chars FROM r WHERE rn <= 5
          |ORDER BY lang, doc_id""".stripMargin
      )
    ) { (spark, dir) =>
      // (a*b) % p as ((a%p)*(b%p)) % p — identical for non-negative ids,
      // and the partial products stay < 1e12, so the multiply can never
      // overflow Long (the raw a*b form broke at the factor-1000 slice:
      // doc_id reaches 1e10, and 1e10 * 2654435761 > 2^63; DuckDB's
      // HUGEINT hides the same hazard on the oracle side)
      val u = ((col("doc_id") % 1000003L) * lit(2654435761L % 1000003L)
        % 1000003L + 1L) / lit(1000004.0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("k").desc, col("doc_id"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"), (log(u) / col("n_chars")).as("k"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    },

    // SCD-2 history build (gaps-and-islands): collapse each user's event
    // run into validity intervals — a row survives only where the tracked
    // attribute CHANGES (lag compare), then valid_to = the next change's
    // valid_from (lead), NULL marking the current state. Both windows share
    // one user_id partitioning, so the whole history build is a single
    // shuffle; at 100 TB this is the standard dimension-history
    // materialization that q_upsert's SCD-1 MERGE cannot express.
    Declared(
      "q_scd2",
      Some(
        """WITH s AS (
          |  SELECT user_id, ts, event_id, event_type,
          |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |  FROM events WHERE user_id < 20),
          |c AS (SELECT user_id, ts, event_id, event_type FROM s
          |      WHERE prev IS NULL OR prev <> event_type)
          |SELECT user_id, event_type, ts AS valid_from,
          |       coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
          |                TIMESTAMP '2099-12-31 00:00:00') AS valid_to,
          |       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
          |         AS is_current
          |FROM c ORDER BY user_id, valid_from, event_id""".stripMargin
      )
    ) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, dir)
        .where(col("user_id") < 20)
        .withColumn("prev", lag("event_type", 1).over(w))
        .where(col("prev").isNull || col("prev") =!= col("event_type"))
        .withColumn("next_ts", lead("ts", 1).over(w))
        .select(
          col("user_id"), col("event_type"), col("ts").as("valid_from"),
          coalesce(col("next_ts"), lit("2099-12-31 00:00:00").cast("timestamp"))
            .as("valid_to"),
          col("next_ts").isNull.as("is_current"), col("event_id"))
        // event_id tiebreak keeps the row order deterministic when two
        // change-rows for one user share a ts (matches the oracle ORDER BY)
        .orderBy("user_id", "valid_from", "event_id")
        .drop("event_id")
    },

    // runtime bloom-filter join pruning: the dim side (orders over the
    // price cut) builds a distributed bloom over its join keys and the
    // FACT side is pruned by a codegen'd graft_bloom_contains predicate
    // directly above its scan — before the join shuffle ever sees the
    // ~98% of lineitem that cannot match. The exact join then removes the
    // bloom's false positives, so the result hash-matches the plain-join
    // oracle (which is the whole correctness statement of runtime
    // filtering). BloomSpec asserts the fpp bound + no-false-negatives.
    Declared(
      "q_bloomjoin",
      Some(
        """SELECT l_returnflag, count(*) AS n,
          |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE o_totalprice > 400000
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
      )
    ) { (spark, dir) =>
      val dim = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 400000)
        .select("o_orderkey")
      graft.operators.BloomPrune
        .prune(Tables.lineitem(spark, dir), "l_orderkey", dim, "o_orderkey")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        // exact-cents money sum (rationale at q_bucket): 3 wide groups at sf1
        .agg(count(lit(1)).as("n"),
          round(Money.sumMoney(col("l_extendedprice")), 4).as("revenue"))
        .orderBy("l_returnflag")
    },

    // Z-order (Morton) clustering key: multi-dimensional data skipping.
    // q_clusterby's 1-D range layout prunes only its sort column; sorting
    // by the interleaved code keeps BOTH user_id and event_id locality in
    // every file, so min/max stats prune filters on either column (layout
    // quality is asserted quantitatively in ZOrderSpec). The native
    // codegen'd graft_zorder expression is the clustering key; the oracle
    // replays the bit interleave with DuckDB list arithmetic, and the
    // bucketed roll-up keeps the checked output small at any SF.
    Declared(
      "q_zorder",
      Some(
        """WITH z AS (
          |  SELECT CAST(list_sum(list_transform(range(0, 21), i ->
          |           ((user_id >> i) & 1) * (1::BIGINT << (2*i)) +
          |           ((event_id >> i) & 1) * (1::BIGINT << (2*i+1)))) AS BIGINT) AS zcode
          |  FROM events)
          |SELECT zcode >> 32 AS zbucket, count(*) AS n,
          |       min(zcode) AS zmin, max(zcode) AS zmax
          |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(expr("graft_zorder(user_id, event_id)").as("zcode"))
        .groupBy(shiftright(col("zcode"), 32).as("zbucket"))
        .agg(count(lit(1)).as("n"), min("zcode").as("zmin"), max("zcode").as("zmax"))
        .orderBy("zbucket")
    },

    // hive-style partitioned layout: write partitionBy(event_type), read
    // one partition — the scan's PartitionFilters eliminate the other
    // directories BEFORE any file I/O (vs q_clusterby's row-group stats,
    // which still open footers). The two compose at scale: partition on
    // the coarse key, cluster within partitions on the range key.
    Declared(
      "q_partitioned",
      Some(
        """SELECT event_id, user_id, round(value, 4) AS value FROM events
          |WHERE event_type = 'error' ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      val out = graft.ScratchDirs.dir("graft-part")
      Tables.events(spark, dir)
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(out)
      spark.read.parquet(out)
        .where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), round(col("value"), 4).as("value"))
        .orderBy("event_id")
    },

    // ordered collect: per-user sorted event array (collect_list is
    // unordered by contract → sort_array makes it canonical)
    Declared(
      "q_collect",
      Some(
        // joined to a string: the driver's pandas row-sort cannot hash an
        // array-typed cell (r03 crash), so the canonical list is emitted
        // as a comma-joined string on both sides
        """SELECT user_id,
          |       array_to_string(list(event_id ORDER BY event_id), ',') AS event_ids
          |FROM events WHERE event_type = 'purchase'
          |GROUP BY user_id ORDER BY user_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(
          array_join(sort_array(collect_list(col("event_id"))).cast("array<string>"), ",")
            .as("event_ids"))
        .orderBy("user_id")
    },

    // conditional aggregates: count_if / bool_or / bool_and
    Declared(
      "q_condagg",
      Some(
        // CAST: DuckDB count_if yields HUGEINT → pandas float64 → the
        // driver hashes "290.0" against Spark's int64 "290" (r03 mismatch)
        """SELECT event_type,
          |       CAST(count_if(value > 100) AS BIGINT) AS n_big,
          |       bool_or(value > 190) AS any_huge,
          |       bool_and(value >= 0) AS all_nonneg
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          count_if(col("value") > 100).as("n_big"),
          bool_or(col("value") > 190).as("any_huge"),
          bool_and(col("value") >= 0).as("all_nonneg"))
        .orderBy("event_type")
    },

    // distribution-ranking window functions: ntile/percent_rank/cume_dist
    // (unique (value, event_id) total order per partition → deterministic).
    // pr/cd ship as RAW doubles: both engines compute the same exact
    // integer ratios ((rank-1)/(n-1), peers/n) whose IEEE division is
    // correctly rounded, so the bits agree at any scale — an in-query
    // round(…,4) split the engines at a .00005 half boundary once
    // partitions hit 25M rows (factor-1000 digest sweep, sixth catch:
    // Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds via
    // a ×10⁴ double multiply).
    Declared(
      "q_ranks",
      Some(
        """SELECT event_id, event_type,
          |       ntile(4) OVER w AS quartile,
          |       percent_rank() OVER w AS pr,
          |       cume_dist() OVER w AS cd
          |FROM events
          |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
          |ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      Tables.events(spark, dir)
        .select(
          col("event_id"), col("event_type"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("event_id")
    },

    // argmin/argmax: value at the newest/oldest event per type (ordering
    // key event_id is unique → deterministic; max_by == DuckDB arg_max)
    Declared(
      "q_argmax",
      Some(
        """SELECT event_type,
          |       arg_max(user_id, event_id) AS latest_user,
          |       arg_min(user_id, event_id) AS first_user,
          |       round(arg_max(value, event_id), 4) AS latest_value
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          max_by(col("user_id"), col("event_id")).as("latest_user"),
          min_by(col("user_id"), col("event_id")).as("first_user"),
          round(max_by(col("value"), col("event_id")), 4).as("latest_value"))
        .orderBy("event_type")
    },

    // string scalar surface: concat_ws / lpad / translate / replace / instr
    Declared(
      "q_strfns",
      Some(
        """SELECT event_id,
          |       concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS tag,
          |       lpad(CAST(user_id AS VARCHAR), 6, '0') AS padded,
          |       translate(event_type, 'aeiou', 'AEIOU') AS caps_vowels,
          |       replace(event_type, 'e', '3') AS leeted,
          |       CAST(strpos(event_type, 'r') AS BIGINT) AS r_pos
          |FROM events ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          concat_ws("-", col("event_type"), col("user_id").cast("string")).as("tag"),
          lpad(col("user_id").cast("string"), 6, "0").as("padded"),
          translate(col("event_type"), "aeiou", "AEIOU").as("caps_vowels"),
          regexp_replace(col("event_type"), "e", "3").as("leeted"),
          instr(col("event_type"), "r").cast("long").as("r_pos"))
        .orderBy("event_id")
    },

    // date/time scalar surface: parts + epoch seconds
    Declared(
      "q_datefns",
      Some(
        """SELECT event_id,
          |       CAST(extract(year FROM ts) AS BIGINT) AS y,
          |       CAST(extract(month FROM ts) AS BIGINT) AS mo,
          |       CAST(extract(day FROM ts) AS BIGINT) AS dom,
          |       CAST(extract(hour FROM ts) AS BIGINT) AS h,
          |       CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s
          |FROM events ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(
          col("event_id"),
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("mo"),
          dayofmonth(col("ts")).cast("long").as("dom"),
          hour(col("ts")).cast("long").as("h"),
          unix_timestamp(col("ts")).as("epoch_s"))
        .orderBy("event_id")
    },

    // positional explode (UDTF shape): token + 1-based position
    Declared(
      "q_posexplode",
      Some(
        """SELECT doc_id, ord, tok FROM (
          |  SELECT doc_id,
          |         unnest(regexp_split_to_array(text, ' +')) AS tok,
          |         generate_subscripts(regexp_split_to_array(text, ' +'), 1) AS ord
          |  FROM documents WHERE doc_id < 5)
          |ORDER BY doc_id, ord""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.documents(spark, dir)
        .filter(col("doc_id") < 5)
        .select(col("doc_id"), posexplode(split(col("text"), " +")).as(Seq("pos", "tok")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("ord"), col("tok"))
        .orderBy("doc_id", "ord")
    },

    // VARIANT (Spark 4 semi-structured type): parse once, extract typed —
    // the schema-on-read path for the reference's opaque `data` payloads
    Declared(
      "q_variant",
      Some(
        """SELECT event_id,
          |       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
          |       json_extract_string(props, '$.source') AS src
          |FROM events ORDER BY event_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k"),
          variant_get(col("v"), "$.source", "string").as("src"))
        .orderBy("event_id")
    },

    // theta join (equi prefix + inequality refinement): distinct nation
    // pairs within a region — broadcast + codegen'd BNL refinement
    Declared(
      "q_theta",
      Some(
        """SELECT a.n_name AS n1, b.n_name AS n2
          |FROM nation a JOIN nation b
          |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
          |ORDER BY n1, n2""".stripMargin
      )
    ) { (spark, dir) =>
      val a = Tables.nation(spark, dir).select(
        col("n_name").as("n1"), col("n_regionkey").as("r1"), col("n_nationkey").as("k1"))
      val b = Tables.nation(spark, dir).select(
        col("n_name").as("n2"), col("n_regionkey").as("r2"), col("n_nationkey").as("k2"))
      a.join(broadcast(b), col("r1") === col("r2") && col("k1") < col("k2"))
        .select("n1", "n2")
        .orderBy("n1", "n2")
    },

    // salted equi-join — hot-key spreading over 8 reducers; hash-identical
    // to the plain join (every probe row meets exactly one replica). The
    // orders→customer join stands in for a fact table with a dominant key.
    Declared(
      "q_skewjoin",
      Some(
        """SELECT c_mktsegment, count(*) AS n_orders,
          |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
      )
    ) { (spark, dir) =>
      graft.operators.SkewJoin
        .saltedEquiJoin(
          Tables.orders(spark, dir), Tables.customer(spark, dir),
          "o_custkey", "c_custkey",
          salts = 8, saltSource = Seq(col("o_orderkey")))
        .groupBy("c_mktsegment")
        // exact-cents sum: order-independent at any scale (rationale at q_bucket)
        .agg(count(lit(1)).as("n_orders"),
          round(Money.sumMoney(col("o_totalprice")), 4).as("total"))
        .orderBy("c_mktsegment")
    },

    // distributed dense-offset assignment (SURVEY hard part #1, the 100 TB
    // ingest path): range-shuffle + two parallel passes; event_id is dense
    // so offset == event_id proves gap-free density and global order
    Declared(
      "q_dense",
      Some(
        """SELECT event_id AS log_offset, event_id, user_id FROM events
          |ORDER BY log_offset""".stripMargin
      )
    ) { (spark, dir) =>
      val ev   = Tables.events(spark, dir).select("event_id", "user_id")
      val base = ev.agg(min("event_id")).head().getLong(0)
      graft.operators.DenseOffsets.assign(ev, "event_id", base)
        .select(col("offset").as("log_offset"), col("event_id"), col("user_id"))
        .orderBy("log_offset")
    },

    // salted two-phase aggregation — the hot-key mitigation: partial agg on
    // (key, salt) spreads a skewed key over 16 reducers, final agg merges.
    // Hash-identical to the plain single-phase oracle by construction —
    // which REQUIRES order-independent partials: the factor-1000 sweep
    // caught the double psum drifting 1e-4 at magnitude 1e9 (the salt
    // phases re-order accumulation vs the oracle's single pass), so the
    // partials carry exact integer cents (events.value is 2-decimal by
    // corpus contract) and one final division restores dollars.
    Declared(
      "q_salted",
      Some(
        """SELECT event_type, count(*) AS n,
          |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS total
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"), sum(Money.cents(col("value"))).as("psum"))
        .groupBy("event_type")
        .agg(sum("pn").as("n"), round(sum("psum") / 100.0, 4).as("total"))
        .orderBy("event_type")
    }
  )
}
