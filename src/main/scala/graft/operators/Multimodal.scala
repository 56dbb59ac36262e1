package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * `BINARY` columns with typed metadata, plus the decode / feature-extract /
 * frame-sample operators a training-data pipeline hangs off them.
 *
 * The real codec calls are STUBBED (this container has no image/audio
 * libraries): [[StubDecoder]] is a deterministic fake standing where
 * libjpeg/ffmpeg bindings would go. Everything AROUND the stub — the
 * schema, the binary column handling, the partition-wise batched execution
 * shape ([[decodeFeatures]] is `mapPartitions`, the Scala analog of a
 * PySpark `mapInPandas` batch UDF: per-partition iterator in, per-partition
 * iterator out, decoder state initialized once per partition, never per
 * row), and the pure-SQL byte-level operators — is real and tested.
 *
 * Scale: binary payloads ride in Parquet like any column (row-group
 * pruning still works on the metadata columns); decode is a narrow map,
 * so the 100 TB path is scan → decode → feature columns with zero
 * shuffles until the caller aggregates.
 */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),       // image | audio | video | text
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),     // pixels / samples-per-frame
    StructField("height", IntegerType)
  ))

  /**
   * Synthesize a media table from the documents corpus: the utf-8 bytes of
   * `text` play the opaque payload (deterministic, hermetic). Kind/width/
   * height derive from byte length so metadata predicates are exercisable.
   */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        when(col("n_chars") % 3 === 0, "image")
          .when(col("n_chars") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height")
      ).as("meta"))

  /** Frame sampling: every `frameBytes`-byte slice of the payload, pure SQL
    * (`substring` on BINARY) — the batch-shape analog of video frame
    * extraction. An EMPTY payload yields zero frames, matching
    * [[StubDecoder.decode]]'s n_frames = 0 (the greatest(...) floor alone
    * would emit one zero-byte frame for it). */
  def frameSample(media: org.apache.spark.sql.Column, frameBytes: Int = 64): org.apache.spark.sql.Column =
    when(octet_length(media) === 0, array().cast("array<binary>"))
      .otherwise(transform(
        sequence(lit(0), greatest(floor((octet_length(media) - 1) / lit(frameBytes)).cast("int"), lit(0))),
        i => substring(media, i * frameBytes + 1, lit(frameBytes))))

  /** One decoded-feature row per asset. */
  case class MediaFeatures(
      asset_id: Long, kind: String, n_bytes: Long,
      n_frames: Int, mean_byte: Double, digest: Long)

  /**
   * The stubbed codec. A real implementation would JNI into libjpeg/ffmpeg
   * here; this fake is deterministic over the payload bytes so tests and
   * oracle-adjacent checks stay exact. Constructed once per PARTITION (cf.
   * [[decodeFeatures]]) — the expensive-init-amortization pattern that
   * matters when the decoder is a native library.
   */
  final class StubDecoder(frameBytes: Int = 64) {
    def decode(assetId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      val nFrames  = if (payload.isEmpty) 0 else (payload.length + frameBytes - 1) / frameBytes
      // exact integer byte sum, ONE double division: the emitted mean is
      // then bit-identical to any engine computing sum(int)/len, so the
      // compare layer's own float rounding can never split at a decimal
      // half boundary (a double-accumulated mean did, at factor 100)
      val meanByte = if (payload.isEmpty) 0.0
                     else {
                       var s = 0L
                       payload.foreach(b => s += (b & 0xFF))
                       s.toDouble / payload.length
                     }
      var h = 1125899906842597L // deterministic rolling hash of the bytes
      payload.foreach(b => h = h * 31 + (b & 0xFF))
      MediaFeatures(assetId, kind, payload.length.toLong, nFrames, meanByte, h)
    }
  }

  /**
   * Partition-wise batched decode (the `mapInPandas` shape in Scala):
   * iterator-in/iterator-out over whole partitions, one decoder instance
   * per partition. Narrow — no shuffle.
   */
  def decodeFeatures(spark: SparkSession, media: DataFrame, frameBytes: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("asset_id", "meta.kind", "media")
      .mapPartitions { rows: Iterator[Row] =>
        val decoder = new StubDecoder(frameBytes) // once per partition
        rows.map(r => decoder.decode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
      }
  }

  /** One resized-asset row: the thumbnail payload plus its audit stats. */
  case class ResizedAsset(asset_id: Long, out_bytes: Int, mean_byte: Double)

  /**
   * Resize/thumbnail stage of the media pipeline. A real implementation
   * would hand the payload to an image scaler; the stub downsamples the
   * byte stream at an even stride to `targetBytes` (output byte `i` =
   * input byte `floor(i*n/m)`), which preserves the decode→resize→
   * feature-extract pipeline shape: narrow map, one codec instance per
   * partition, payload in / smaller payload out. Deterministic, so the
   * DuckDB oracle re-derives the stats from the text bytes exactly.
   */
  /** Even-stride downsample: output byte `i` = input byte `floor(i*n/m)`,
    * `m = min(n, targetBytes)`. Pure — property-tested in PropertySpec. */
  def strideSample(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    val n = payload.length
    val m = math.min(n, targetBytes)
    Array.tabulate(m)(i => payload((i.toLong * n / m).toInt))
  }

  /**
   * Perceptual difference-hash (dHash) of a media payload — the image
   * near-dup fingerprint (VERDICT r13 item 4: the raw-media analog of
   * MinHash/SimHash). Real dHash resizes the decoded image to a 9×8
   * luminance grid and sets one bit per horizontal gradient
   * (pixel[i] > pixel[i+1]); with the codec stubbed (this container has
   * no image libraries), the decode+resize stands in as the SAME
   * even-stride byte downsample the resize stage uses
   * ([[strideSample]] to 64 bytes), and each bit is the byte gradient
   * `sample[i] > sample[i+1]` — bit i of the result, LSB-first. At most
   * 63 bits are set (64-byte sample → 63 gradients), which keeps the
   * hash — and the DuckDB oracle's Σ 2^i replay — inside non-negative
   * BIGINT range. The construction is deterministic byte math end to
   * end, so q_mediadup is hash-checked by a full SQL oracle rather than
   * a literal-table replay. Payloads shorter than the grid hash their
   * m−1 gradients; empty/1-byte payloads hash to 0.
   *
   * The dHash property that makes banding sound survives the stub: a
   * LOCAL payload perturbation moves few sampled bytes, so few gradient
   * bits flip — Hamming distance is the right near-dup metric on it.
   */
  def dHash(payload: Array[Byte], gridBytes: Int = 64): Long = {
    val s = strideSample(payload, gridBytes)
    var h = 0L
    var i = 0
    while (i < s.length - 1) {
      if ((s(i) & 0xFF) > (s(i + 1) & 0xFF)) h |= 1L << i
      i += 1
    }
    h
  }

  /** One perceptual-hash row per asset. */
  case class PerceptualHash(asset_id: Long, dhash: Long)

  /** Partition-wise batched perceptual hashing — the decode→hash stage in
    * the same mapPartitions batch shape as [[decodeFeatures]] (codec
    * state once per partition; narrow, no shuffle). */
  def perceptualHashes(spark: SparkSession, media: DataFrame): Dataset[PerceptualHash] = {
    import spark.implicits._
    media.select("asset_id", "media")
      .mapPartitions { rows: Iterator[Row] =>
        rows.map(r => PerceptualHash(r.getLong(0), dHash(r.getAs[Array[Byte]](1))))
      }
  }

  def resizeAssets(spark: SparkSession, media: DataFrame, targetBytes: Int = 256): Dataset[ResizedAsset] = {
    import spark.implicits._
    media.select("asset_id", "media")
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id  = r.getLong(0)
          val out = strideSample(r.getAs[Array[Byte]](1), targetBytes)
          if (out.isEmpty) ResizedAsset(id, 0, 0.0)
          else {
            var s = 0L
            out.foreach(b => s += (b & 0xFF))
            ResizedAsset(id, out.length, s.toDouble / out.length)
          }
        }
      }
  }
}
