package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("mediaFrame: binary payload with typed metadata") {
    val media = Multimodal.mediaFrame(Tables.documents(spark, dir))
    assert(media.schema("media").dataType.typeName === "binary")
    assert(media.schema("meta").dataType.typeName === "struct")
    val r = media.orderBy("asset_id").head()
    val payload = r.getAs[Array[Byte]]("media")
    val meta    = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") === payload.length.toLong)
    assert(Seq("image", "audio", "video").contains(meta.getAs[String]("kind")))
  }

  test("frameSample slices the payload into frame-sized chunks") {
    val media = Multimodal.mediaFrame(Tables.documents(spark, dir))
    val row = media
      .select(col("meta.n_bytes").as("n"),
        size(Multimodal.frameSample(col("media"), 64)).as("k"),
        octet_length(element_at(Multimodal.frameSample(col("media"), 64), 1)).as("first"))
      .orderBy(desc("n")).head()
    val (n, k) = (row.getLong(0), row.getInt(1))
    assert(k === ((n + 63) / 64).toInt)
    assert(row.getInt(2) === 64) // full first frame
    // empty payload → ZERO frames, agreeing with StubDecoder's n_frames=0
    // (not one zero-byte frame)
    val empty = spark.sql("SELECT CAST('' AS BINARY) AS media")
      .select(size(Multimodal.frameSample(col("media"), 64)).as("k")).head()
    assert(empty.getInt(0) === 0)
  }

  test("decodeFeatures (mapPartitions stub codec) matches SQL-derived byte stats") {
    val docs  = Tables.documents(spark, dir)
    val media = Multimodal.mediaFrame(docs)
    val decoded = Multimodal.decodeFeatures(spark, media)
      .select(col("asset_id"), col("n_frames"), round(col("mean_byte"), 4).as("mb"))
    // independent derivation through a different engine path (HOF SQL)
    val viaSql = docs.select(
      col("doc_id").as("asset_id"),
      ceil(octet_length(encode(col("text"), "UTF-8")) / lit(64.0)).cast("int").as("n_frames"),
      round(
        aggregate(split(col("text"), ""), lit(0.0), (acc, c) => acc + ascii(c)) /
          length(col("text")), 4).as("mb"))
    assert(decoded.join(viaSql, Seq("asset_id", "n_frames", "mb"), "left_anti").count() === 0)
    assert(decoded.count() === docs.count())
  }

  test("resizeAssets subsamples to the target size at an even stride") {
    val media = Multimodal.mediaFrame(Tables.documents(spark, dir))
    val out = Multimodal.resizeAssets(spark, media, targetBytes = 16)
      .orderBy("asset_id").head()
    val payload = media.orderBy("asset_id").head().getAs[Array[Byte]]("media")
    val n = payload.length
    val m = math.min(n, 16)
    assert(out.out_bytes === m)
    val expected = (0 until m).map(i => (payload((i.toLong * n / m).toInt) & 0xFF).toDouble).sum / m
    assert(math.abs(out.mean_byte - expected) < 1e-9)
    // no-op resize when the payload is already under the target
    val big = Multimodal.resizeAssets(spark, media, targetBytes = Int.MaxValue)
      .orderBy("asset_id").head()
    assert(big.out_bytes === n)
  }

  test("metadata predicates prune without touching payloads") {
    val media  = Multimodal.mediaFrame(Tables.documents(spark, dir))
    val images = media.filter(col("meta.kind") === "image").select("asset_id", "meta.n_bytes")
    assert(images.count() > 0)
  }
}
