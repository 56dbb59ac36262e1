package graft.queries

import graft.Tables
import graft.functions.Similarity
import org.apache.spark.sql.functions._

/**
 * Extended operators (SURVEY.md §2.3 extended block + training-data
 * pipeline ops): dedup, text analysis, embedding similarity. The heavier
 * approximate variants (MinHash-LSH, SimHash, ANN buckets) live in their
 * own modules; these are the exactly-oracle-checkable forms.
 */
object ExtendedQueries {

  val all: Seq[Declared] = Seq(
    // exact dedup cardinality
    Declared(
      "q_dedup",
      Some(
        "SELECT count(*) AS n FROM (SELECT DISTINCT user_id, event_type FROM events) t")
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .select("user_id", "event_type")
        .distinct()
        .agg(count(lit(1)).as("n"))
    },

    // exact dedup rows (hash-aggregate distinct; shuffle on the dedup key)
    Declared(
      "q_dedup_rows",
      Some(
        """SELECT DISTINCT user_id, event_type FROM events
          |ORDER BY user_id, event_type""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.events(spark, dir)
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
    },

    // text corpus profile. avg_chars ships as the unrounded exact-ratio
    // double (integer char total / count — both engines sum exactly below
    // 2^53 chars per lang, and IEEE division of exact integers is
    // correctly rounded): a round(,4) here is the q_agg shortest-repr
    // half-boundary class once a lang's count divides the total into a
    // 5-decimal half (e.g. avg ending .15625 at lang counts with a /32
    // reduced denominator).
    Declared(
      "q_text",
      Some(
        """SELECT lang, count(*) AS docs,
          |       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.documents(spark, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          (sum("n_chars").cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy("lang")
    },

    // brute-force cosine top-10 against probe vec_id=0. Probe side is a
    // 1-row broadcast; scoring is a narrow map over the embeddings scan;
    // top-K is TakeOrderedAndProject (per-partition heap + K-row merge).
    Declared(
      "q_sim",
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
      val emb   = Tables.embeddings(spark, dir)
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("p"), Similarity.l2Norm(col("embedding")).as("p_norm"))
      emb
        .crossJoin(broadcast(probe))
        .select(
          col("vec_id"),
          round(Similarity.cosineVsProbe(col("embedding"), col("p"), col("p_norm")), 4).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }
  )
}
