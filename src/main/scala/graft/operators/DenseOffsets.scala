package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed dense-offset assignment — SURVEY §7 "hard part #1" at scale.
 *
 * The serving-layer sink ([[graft.streaming.OffsetLog]]) assigns offsets
 * through the micro-batch boundary single-writer, mirroring the reference's
 * collector goroutine (`cmd/server/main.go:86-152`). That is correct for a
 * bounded serving log but caps ingest at one node's append rate. This
 * operator is the 100 TB path: a dense, gap-free `offset` column assigned
 * WITHOUT driver-side data movement, via the classic two-pass scheme —
 * range-repartition + in-partition sort for a contiguous globally-ordered
 * slice per partition, then per-partition counts (one long each to the
 * driver) prefix-summed into partition bases, then a second local pass
 * adding base + local index.
 *
 * Delegates to [[Pack.assignOffsets]] with unit weights — a dense row
 * index IS the exclusive running sum of 1s — so the repo has exactly ONE
 * implementation of the two-pass prefix sum (previously this was a
 * parallel `RDD.zipWithIndex` copy of the same pattern; VERDICT r09
 * item 6).
 *
 * `monotonically_increasing_id` cannot do this (sparse by design); a
 * global `row_number()` window would serialize through one partition. Two
 * parallel passes are the price of density.
 */
object DenseOffsets {

  /**
   * Append a dense `offset` column: `base`, `base+1`, … in ascending
   * `orderCol` order. `orderCol` must be globally unique (ties would make
   * the order, and thus the assignment, nondeterministic).
   */
  def assign(df: DataFrame, orderCol: String, base: Long, partitions: Int = 0): DataFrame = {
    val w = "__graft_unit_weight"
    Pack.assignOffsets(df.withColumn(w, lit(1L)), orderCol, w, partitions)
      .withColumn("offset", col("start_off") + lit(base))
      .drop(w, "start_off")
  }
}
