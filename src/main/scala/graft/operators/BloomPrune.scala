package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Runtime bloom-filter join pruning — the semi-join reduction that makes
 * selective dim→fact joins cheap at 100 TB: build a bloom filter over the
 * (already filtered) dimension keys with a distributed `stat.bloomFilter`
 * aggregate, then drop fact rows whose key cannot match BEFORE the fact
 * side is shuffled for the join. The filter is a codegen'd predicate
 * directly above the fact scan, so the join's shuffle reads only
 * `|fact ⋉ dim| + fpp·|fact|` rows instead of `|fact|`.
 *
 * Correctness contract: bloom filters have false POSITIVES only, so the
 * pruned fact is a superset of the joinable rows and the exact join that
 * follows keeps the result identical to the unpruned plan (q_bloomjoin
 * hash-checks exactly that against the plain-join oracle).
 *
 * This is the manual form of Spark's InjectRuntimeFilter rewrite (which
 * needs CBO stats to trigger); making it an explicit operator keeps the
 * pruning deterministic for pipeline authors.
 */
object BloomPrune {

  /** Distributed build of the dim-side bloom filter, serialized. */
  def bloomBytes(dim: DataFrame, key: String, fpp: Double = 0.01): Array[Byte] = {
    // expectedNumItems from a count over the (filtered) dim — one scalar to
    // the driver; the bloom build itself is a treeAggregate, never a collect
    val n = math.max(1L, dim.select(key).count())
    val bloom = dim.stat.bloomFilter(key, n, fpp)
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** Fact rows whose `factKey` might be in `dim`'s `dimKey` set. */
  def prune(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
            fpp: Double = 0.01): DataFrame =
    fact.where(call_function(
      "graft_bloom_contains", col(factKey), lit(bloomBytes(dim, dimKey, fpp))))
}
