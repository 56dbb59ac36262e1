package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/**
 * Text-analysis surface for the training-data pipeline (language-ID,
 * quality scoring, token counting, fingerprinting), all oracle-checked:
 * every heuristic is a deterministic formula the DuckDB SQL mirrors
 * exactly. Narrow maps over the documents scan — no shuffle until the
 * final aggregate/sort.
 */
object TextQueries {

  // the DuckDB-side mirror of TextAnalysis.LangMarkers scores
  private def duckScore(markers: Seq[String]): String =
    s"len(list_filter(regexp_split_to_array(text, ' +'), t -> t IN (${markers.map(m => s"'$m'").mkString(",")})))"

  private val duckLangCase: String = {
    val scores = TextAnalysis.LangMarkers.map { case (l, ms) => l -> duckScore(ms) }
    val best   = s"greatest(${scores.map(_._2).mkString(", ")})"
    val whens = scores
      .map { case (l, s) => s"WHEN $s > 0 AND $s = $best THEN '$l'" }
      .mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  val all: Seq[Declared] = Seq(
    // token counting: whitespace tokens + BPE-ish subword pieces
    Declared(
      "q_tokens",
      Some(
        """SELECT doc_id,
          |       len(regexp_split_to_array(text, ' +')) AS n_tokens,
          |       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subwords
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    },

    // language identification (marker-token heuristic) + corpus profile
    Declared(
      "q_lang",
      Some(
        s"""SELECT $duckLangCase AS lang_guess, count(*) AS docs
           |FROM documents GROUP BY 1 ORDER BY lang_guess""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.documents(spark, dir)
        .groupBy(TextAnalysis.languageId(col("text")).as("lang_guess"))
        .agg(count(lit(1)).as("docs"))
        .orderBy("lang_guess")
    },

    // quality scoring: per-document components + composite
    Declared(
      "q_quality",
      Some(
        """SELECT doc_id,
          |       round(least(n_chars / 500.0, 1.0), 4) AS len_score,
          |       round(len(regexp_replace(text, '[a-z ]', '', 'g')) * 1.0 / nullif(len(text), 0), 4) AS punct_ratio,
          |       round(len(list_filter(regexp_split_to_array(text, ' +'), t -> t IN ('the','a','of','and','to'))) * 1.0
          |             / nullif(len(regexp_split_to_array(text, ' +')), 0), 4) AS stop_ratio
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          round(TextAnalysis.lengthScore(col("n_chars")), 4).as("len_score"),
          round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
          round(TextAnalysis.stopwordRatio(col("text")), 4).as("stop_ratio"))
        .orderBy("doc_id")
    },

    // word-repetition quality rule: 1 − distinct/total tokens per doc,
    // aggregated per language with a flagged-docs count (templated or
    // looping text scores high; the standard boilerplate filter alongside
    // length/punct/stopword above). Narrow map + one group-by shuffle.
    Declared(
      "q_repetition",
      Some(
        """SELECT lang, count(*) AS docs,
          |       round(avg(rep), 4) AS avg_rep,
          |       CAST(count_if(rep > 0.2) AS BIGINT) AS repetitive
          |FROM (
          |  SELECT lang,
          |         1.0 - len(list_distinct(regexp_split_to_array(text, ' +'))) * 1.0
          |               / nullif(len(regexp_split_to_array(text, ' +')), 0) AS rep
          |  FROM documents)
          |GROUP BY lang ORDER BY lang""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("lang"), TextAnalysis.repetitionRatio(col("text")).as("rep"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("docs"),
          round(avg("rep"), 4).as("avg_rep"),
          sum(when(col("rep") > 0.2, 1L).otherwise(0L)).as("repetitive"))
        .orderBy("lang")
    },

    // bounded-memory heavy hitters (Misra-Gries TypedImperativeAggregate):
    // top-10 corpus tokens through the sketch. capacity=1024 >> the 31
    // distinct tokens here, so counts are exact and the oracle checks them;
    // at adversarial vocabulary the same plan keeps <=1024 counters per
    // partition (guarantees stress-tested in TopKSketchSpec)
    Declared(
      "q_heavy",
      Some(
        """SELECT tok, n FROM (
          |  SELECT tok, count(*) AS n
          |  FROM (SELECT unnest(regexp_split_to_array(text, ' +')) AS tok FROM documents)
          |  GROUP BY tok)
          |ORDER BY n DESC, tok LIMIT 10""".stripMargin
      )
    ) { (spark, dir) =>
      import graft.expressions.TopKSketch
      Tables.documents(spark, dir)
        .select(explode(split(col("text"), " +")).as("tok"))
        .agg(TopKSketch.heavyHitters(col("tok"), 1024).as("sketch"))
        .select(explode(col("sketch")).as("hh"))
        .select(col("hh.tok").as("tok"), col("hh.n").as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(10)
    },

    // Rabin-Karp rolling-hash fingerprint (native codegen expression);
    // oracle mirrors the recurrence with list_reduce over ascii codes
    Declared(
      "q_rollhash",
      Some(
        """SELECT doc_id,
          |       list_reduce(
          |         list_prepend(7::BIGINT,
          |           list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
          |         (acc, x) -> (acc * 31 + x) % 1000000007) AS fp_roll
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          TextAnalysis.rollingFingerprint(col("text")).as("fp_roll"))
        .orderBy("doc_id")
    },

    // exact-content fingerprints (md5), the exact-dedup primitive
    Declared(
      "q_fingerprint",
      Some(
        """SELECT doc_id, md5(text) AS fp,
          |       md5(trim(regexp_replace(text, ' +', ' ', 'g'))) AS fp_norm
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.normalizedFingerprint(col("text")).as("fp_norm"))
        .orderBy("doc_id")
    }
  )
}
