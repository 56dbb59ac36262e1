package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.Pack
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The composite training-data curation pipeline — the operators proven
 * individually (fingerprint dedup, quality scoring, token counting,
 * deterministic sampling) chained end-to-end the way a 100 TB corpus run
 * would chain them:
 *
 *   normalize → exact-dedup (keep lowest id per fingerprint) →
 *   quality filter → token count → corpus profile.
 *
 * Scale shape: one shuffle on the fingerprint (the dedup window), one on
 * the final group-by; everything between is a narrow codegen'd map. The
 * keeper selection uses row_number over the fingerprint partition — at
 * scale this is the standard "keep canonical doc per duplicate cluster"
 * reduction, and the window shuffle doubles as the dedup shuffle.
 */
object PipelineQueries {

  val all: Seq[Declared] = Seq(
    Declared(
      "q_pipeline",
      Some(
        """WITH dd AS (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY md5(trim(regexp_replace(text, ' +', ' ', 'g')))
          |    ORDER BY doc_id) AS rn
          |  FROM documents),
          |kept AS (SELECT * FROM dd WHERE rn = 1),
          |scored AS (
          |  SELECT lang,
          |         least(n_chars / 500.0, 1.0) AS len_score,
          |         len(list_filter(regexp_split_to_array(text, ' +'),
          |                         t -> t IN ('the','a','of','and','to'))) * 1.0
          |           / nullif(len(regexp_split_to_array(text, ' +')), 0) AS stop_ratio,
          |         len(regexp_split_to_array(text, ' +')) AS n_tokens
          |  FROM kept)
          |SELECT lang, count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
          |FROM scored
          |WHERE len_score >= 0.2 AND stop_ratio > 0
          |GROUP BY lang ORDER BY lang""".stripMargin
      )
    ) { (spark, dir) =>
      val w = Window
        .partitionBy(TextAnalysis.normalizedFingerprint(col("text")))
        .orderBy("doc_id")
      Tables.documents(spark, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .withColumn("len_score", TextAnalysis.lengthScore(col("n_chars")))
        .withColumn("stop_ratio", TextAnalysis.stopwordRatio(col("text")))
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .where(col("len_score") >= 0.2 && col("stop_ratio") > 0)
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
        .orderBy("lang")
    },

    // deterministic train/val/test split assignment (~90/5/5): the split a
    // training run must be able to RECOMPUTE from the raw corpus — no
    // random() (unstable across retries/partitions), no persisted
    // assignment table. Bucket = first md5 hex byte of the doc id; hex
    // strings are fixed-width lowercase in both engines, so the band
    // thresholds are plain string compares (0xe6 = 230/256 ≈ 90%,
    // 0xf3 = 243/256 ≈ 95%). Narrow map + one group-by shuffle; at 100 TB
    // the same expression doubles as the partition key for writing
    // split-partitioned output.
    Declared(
      "q_split",
      Some(
        """WITH b AS (
          |  SELECT lang, n_chars,
          |         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
          |              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
          |              ELSE 'test' END AS split
          |  FROM documents)
          |SELECT lang, split, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
          |FROM b GROUP BY lang, split ORDER BY lang, split""".stripMargin
      )
    ) { (spark, dir) =>
      val prefix = substring(md5(col("doc_id").cast("string")), 1, 2)
      val split = when(prefix < "e6", "train")
        .when(prefix < "f3", "val")
        .otherwise("test")
      Tables.documents(spark, dir)
        .withColumn("split", split)
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("docs"), sum("n_chars").cast("long").as("chars"))
        .orderBy("lang", "split")
    },

    // sequence packing for pre-training: documents concatenated in doc_id
    // order and cut into 2048-token bins; a document belongs to the bin its
    // first token lands in. The global running offset comes from
    // Pack.assignOffsets' two-pass distributed prefix sum (range shuffle +
    // per-partition bases — never a single-partition window), so the same
    // plan holds at 100 TB where `sum() OVER (ORDER BY doc_id)` would
    // serialize through one task. The oracle states the semantics with the
    // single-node window form — the definition, not the scale plan.
    Declared(
      "q_pack",
      Some(
        """WITH toks AS (
          |  SELECT doc_id, len(regexp_split_to_array(text, ' +')) AS n_tokens
          |  FROM documents),
          |off AS (
          |  SELECT doc_id, n_tokens,
          |         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
          |  FROM toks)
          |SELECT CAST(start_off // 2048 AS BIGINT) AS bin,
          |       count(*) AS docs,
          |       CAST(sum(n_tokens) AS BIGINT) AS tokens,
          |       min(doc_id) AS first_doc
          |FROM off GROUP BY 1 ORDER BY 1""".stripMargin
      )
    ) { (spark, dir) =>
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Pack.assignBins(toks, "doc_id", "n_tokens", budget = 2048L)
        .groupBy("bin")
        .agg(
          count(lit(1)).as("docs"),
          sum("n_tokens").as("tokens"),
          min("doc_id").as("first_doc"))
        .orderBy("bin")
    }
  )
}
