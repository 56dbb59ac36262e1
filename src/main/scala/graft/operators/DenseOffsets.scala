package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
 * Implemented on `RDD.zipWithIndex`, which IS that scheme — and because
 * both of its internal jobs run over the same RDD object, the range
 * shuffle is computed once and its map outputs reused, so the counting
 * pass and the indexing pass see identical partitioning (re-executing
 * `repartitionByRange` twice would re-sample boundaries and could
 * disagree).
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
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val ordered = df.repartitionByRange(n, col(orderCol)).sortWithinPartitions(orderCol)

    val schema = StructType(ordered.schema.fields :+ StructField("offset", LongType, nullable = false))
    val rows = ordered.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (base + idx))
    }
    spark.createDataFrame(rows, schema)
  }
}
