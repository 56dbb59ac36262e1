package graft.operators

import graft.functions.Similarity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate nearest-neighbor search over an `ARRAY<FLOAT>` embedding
 * column (no reference analog — extended training-data surface).
 *
 * Two paths:
 *  - [[bruteForceTopK]] — exact cosine scan + `orderBy().limit(k)`;
 *    Catalyst plans TakeOrderedAndProject (per-partition heap, K-row
 *    merge), so the only cost is the scan itself. Correctness baseline.
 *  - [[lshTopK]] — random-hyperplane LSH: each vector gets an H-bit
 *    signature (sign of ⟨v, rⱼ⟩ per plane); the probe explodes into its own
 *    bucket plus all hamming-1 neighbors (multiprobe) and joins on the
 *    bucket, so only matching buckets are scanned before the exact rerank.
 *
 * Scale story (100 TB): signatures are a narrow map (HOF dot products with
 * literal plane vectors, codegen'd). Bucketing the table by `bucket` (or
 * partitioning the Parquet layout on it) turns the probe join into a
 * pruned scan of ~(H+1)/2^H of the data; the rerank cost is per-bucket.
 * The probe side is always a broadcast. An IVF variant (k-means coarse
 * quantizer) swaps the signature for a centroid id — same join shape.
 */
object Ann {

  /** Deterministic Gaussian hyperplanes (seed=42), H planes × dim. */
  def planes(dim: Int, numPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  private def dotLit(v: Column, plane: Seq[Double]): Column =
    Similarity.dotProduct(v, typedLit(plane))

  /** H-bit LSH bucket id of an embedding column. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, j) => when(dotLit(v, p) >= 0, lit(1L << j)).otherwise(lit(0L)) }
      .reduce(_ + _)

  /** Exact cosine top-k against the probe vector of `probeId`. */
  def bruteForceTopK(
      emb: DataFrame, probeId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probe = emb.filter(col(idCol) === probeId)
      .select(col(vecCol).as("p"), Similarity.l2Norm(col(vecCol)).as("p_norm"))
    emb.crossJoin(broadcast(probe))
      .select(col(idCol),
        round(Similarity.cosineVsProbe(col(vecCol), col("p"), col("p_norm")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** All XOR masks within hamming distance `maxHamming` of zero. */
  def multiprobeMasks(numPlanes: Int, maxHamming: Int): Seq[Long] =
    (0L until (1L << numPlanes)).filter(java.lang.Long.bitCount(_) <= maxHamming)

  /**
   * LSH-bucketed approximate top-k: probe bucket + all buckets within
   * hamming distance `maxHamming` (multiprobe), bucket equi-join, exact
   * cosine rerank. Same output schema as [[bruteForceTopK]]. With H=8 and
   * radius 2 the probe scans 37/256 ≈ 14% of a uniformly-bucketed corpus.
   */
  def lshTopK(
      emb: DataFrame, probeId: Long, k: Int,
      numPlanes: Int = 8, maxHamming: Int = 2, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ps       = planes(dim, numPlanes)
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), ps))
    // probe side: explode into the multiprobe bucket set, broadcast
    val probe = bucketed.filter(col(idCol) === probeId)
      .select(col(vecCol).as("p"), Similarity.l2Norm(col(vecCol)).as("p_norm"),
        col("bucket").as("pb"))
      .withColumn("bucket",
        explode(array(multiprobeMasks(numPlanes, maxHamming)
          .map(m => col("pb").bitwiseXOR(lit(m))): _*)))
      .select("bucket", "p", "p_norm")
    bucketed.join(broadcast(probe), "bucket")
      .select(col(idCol),
        round(Similarity.cosineVsProbe(col(vecCol), col("p"), col("p_norm")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
