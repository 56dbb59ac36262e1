package graft.queries

import graft.Tables
import graft.operators.{Ann, Multimodal}
import org.apache.spark.sql.functions._

/**
 * ANN similarity search + multimodal plumbing queries. q_ann is the
 * LSH-bucketed approximate path (xxhash-free but plane signs are not
 * SQL-portable → rows-only; recall vs brute force asserted in AnnSpec);
 * the media queries oracle-check the binary-column plumbing INCLUDING the
 * partition-wise stub decoder (its deterministic outputs are re-derivable
 * in SQL).
 */
object AnnMediaQueries {

  val all: Seq[Declared] = Seq(
    // approximate top-10 for probe vec_id=0 (bucket join + exact rerank)
    Declared("q_ann", None) { (spark, dir) =>
      Ann.lshTopK(Tables.embeddings(spark, dir), probeId = 0L, k = 10)
    },

    // binary media column + typed metadata (schema-level plumbing)
    Declared(
      "q_media",
      Some(
        """SELECT doc_id AS asset_id,
          |       CASE WHEN n_chars % 3 = 0 THEN 'image'
          |            WHEN n_chars % 3 = 1 THEN 'audio'
          |            ELSE 'video' END AS kind,
          |       octet_length(encode(text)) AS n_bytes,
          |       md5(text) AS digest
          |FROM documents ORDER BY asset_id""".stripMargin
      )
    ) { (spark, dir) =>
      Multimodal.mediaFrame(Tables.documents(spark, dir))
        .select(
          col("asset_id"),
          col("meta.kind").as("kind"),
          col("meta.n_bytes").as("n_bytes"),
          md5(col("media")).as("digest"))
        .orderBy("asset_id")
    },

    // partition-wise batched decode (mapPartitions stub codec) — outputs
    // re-derived in SQL byte arithmetic by the oracle
    Declared(
      "q_media_decode",
      Some(
        """SELECT doc_id AS asset_id,
          |       cast(ceil(octet_length(encode(text)) / 64.0) as int) AS n_frames,
          |       round(list_aggregate(list_transform(string_split(text, ''), c -> ascii(c)), 'avg'), 4) AS mean_byte
          |FROM documents ORDER BY asset_id""".stripMargin
      )
    ) { (spark, dir) =>
      val media = Multimodal.mediaFrame(Tables.documents(spark, dir))
      Multimodal.decodeFeatures(spark, media)
        .select(col("asset_id"), col("n_frames"), round(col("mean_byte"), 4).as("mean_byte"))
        .orderBy("asset_id")
    }
  )
}
