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

  test("dHash: exact copies collide; a local byte edit stays within the Hamming band") {
    val base = Array.tabulate(640)(i => ((i * 37 + 11) % 251).toByte)
    val copy = base.clone()
    assert(Multimodal.dHash(base) === Multimodal.dHash(copy))
    // one flipped payload byte moves at most one sampled grid byte, which
    // touches at most its two adjacent gradients — the locality that makes
    // Hamming the right near-dup metric on the hash
    val edited = base.clone(); edited(300) = (edited(300) ^ 0x7f).toByte
    val d = java.lang.Long.bitCount(Multimodal.dHash(base) ^ Multimodal.dHash(edited))
    assert(d <= 2, s"local edit flipped $d hash bits")
    assert((Multimodal.dHash(base) & (1L << 63)) === 0L, "bit 63 must stay clear (oracle BIGINT range)")
  }

  test("pigeonhole closure: any pair within Hamming 3 shares one of the 4 16-bit bands") {
    // the q_mediadup banding-losslessness argument, checked exhaustively
    // over random hashes with <= 3 planted bit flips
    val rnd = new scala.util.Random(11L)
    (1 to 500).foreach { _ =>
      val h1 = rnd.nextLong() & ((1L << 63) - 1)
      var h2 = h1
      (1 to rnd.nextInt(4)).foreach(_ => h2 ^= 1L << rnd.nextInt(63))
      val shares = (0 until 4).exists(b => ((h1 >> (b * 16)) & 0xFFFF) == ((h2 >> (b * 16)) & 0xFFFF))
      assert(shares, f"pair at Hamming ${java.lang.Long.bitCount(h1 ^ h2)} shares no band: $h1%x vs $h2%x")
    }
  }

  test("mediadup keep-first drops planted near-dups (exact copy + local edit) and spares the far asset") {
    import spark.implicits._
    // classes: {1,2,3} exact copies, 4 = one-char edit of the same text
    // (a local perturbation, so within the Hamming band), 5 far
    val a   = "the quick brown fox jumps over the lazy dog " * 8
    val b   = a.updated(100, 'Q')
    val far = "zyxw" * 90
    val docs = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, far))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val hashes = Multimodal.perceptualHashes(spark, Multimodal.mediaFrame(docs))
      .collect().map(p => p.asset_id -> p.dhash).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val dropped = hashes.keys
      .filter(id => hashes.keys.exists(o => o < id && ham(hashes(o), hashes(id)) <= 3)).toSet
    assert(dropped === Set(2L, 3L, 4L))
  }

  test("q_mediadup's banded plan equals the definitional all-pairs drop set on the corpus") {
    // banding duality at spec scale: the declared plan (4×16-bit band
    // buckets + in-join Hamming verify, left-semi) vs a driver-side
    // brute-force over the same hashes — must agree exactly (the
    // pigeonhole test above is WHY; this is THAT it does)
    val media = Multimodal.mediaFrame(Tables.documents(spark, dir))
    val hs = Multimodal.perceptualHashes(spark, media)
      .collect().map(p => p.asset_id -> p.dhash).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val want = hs.keys
      .filter(id => hs.keys.exists(o => o < id && ham(hs(o), hs(id)) <= 3)).toSet
    val got = graft.SparkEntry.queries("q_mediadup")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got === want)
  }

  test("metadata predicates prune without touching payloads") {
    val media  = Multimodal.mediaFrame(Tables.documents(spark, dir))
    val images = media.filter(col("meta.kind") === "image").select("asset_id", "meta.n_bytes")
    assert(images.count() > 0)
  }
}
