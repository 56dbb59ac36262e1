package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit salting for skewed equi-joins — the pre-AQE mitigation that
 * still matters when one build-side key dominates (AQE's skew-join splits
 * oversized SHUFFLE partitions, but a single hot KEY inside one partition
 * can only be spread by salting):
 *
 *  - the (large, skewed) probe side gets `salt = pmod(xxhash64(cols), S)` —
 *    deterministic, so re-runs produce identical plans/results;
 *  - the (smaller) build side is replicated ×S via explode, once per salt;
 *  - the join key becomes (key, salt): the hot key's rows now spread over
 *    S reducers instead of one.
 *
 * Cost model: build-side bytes ×S vs hot-reducer wall-clock ÷S. Correct by
 * construction (every probe row meets exactly one replica of each matching
 * build row) — and hash-proven equal to the plain join by the q_skewjoin
 * oracle.
 */
object SkewJoin {

  /**
   * Inner equi-join `left.keyL == right.keyR` with `salts`-way spreading
   * of the left (skewed) side. `saltSource` columns must be deterministic
   * per row (any stable row identity works; uniqueness not required).
   */
  def saltedEquiJoin(
      left: DataFrame, right: DataFrame,
      keyL: String, keyR: String,
      salts: Int, saltSource: Seq[Column]): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(saltSource: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, l(keyL) === r(keyR) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
