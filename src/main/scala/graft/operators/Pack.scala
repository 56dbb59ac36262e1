package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Sequence packing for LLM pre-training: documents are concatenated in a
 * deterministic global order and cut into fixed token-budget chunks
 * ("bins"); each document's bin is `floor(start_offset / budget)` where
 * `start_offset` is the running token count of everything before it.
 *
 * The hard part at 100 TB is the global running sum: a window
 * `sum() OVER (ORDER BY id)` serializes through ONE partition. This
 * operator computes it with the classic two-pass distributed prefix sum
 * (the repo's ONE implementation of the scheme — [[DenseOffsets]] is the
 * unit-weight specialization delegating here):
 *
 *  1. range-repartition on the order column + in-partition sort, so each
 *     partition holds a contiguous globally-ordered slice;
 *  2. pass 1: per-partition weight totals — ONE long per partition to the
 *     driver (model-artifact-sized, never data);
 *  3. prefix-sum those totals into per-partition bases, broadcast;
 *  4. pass 2: per-partition running sum seeded at the partition base.
 *
 * Both passes run over the same RDD object, so the range shuffle is
 * computed once and its map outputs reused — re-executing
 * `repartitionByRange` would re-sample boundaries and could disagree.
 */
object Pack {

  /**
   * Append a `start_off` column: the exclusive running sum of `weightCol`
   * (LongType) in ascending `orderCol` order. `orderCol` must be globally
   * unique — ties would make the order, and thus the offsets,
   * nondeterministic.
   */
  def assignOffsets(df: DataFrame, orderCol: String, weightCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(weightCol).dataType == LongType,
      s"$weightCol must be LongType (cast before calling)")
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val ordered   = df.repartitionByRange(n, col(orderCol)).sortWithinPartitions(orderCol)
    val rdd       = ordered.rdd // shared by both passes → one shuffle
    val weightIdx = ordered.schema.fieldIndex(weightCol)

    val partTotals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(weightIdx))
        Iterator((pid, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val bases  = partTotals.scanLeft(0L)(_ + _) // bases(pid) = sum of earlier partitions
    val basesB = spark.sparkContext.broadcast(bases)

    val schema = StructType(ordered.schema.fields :+ StructField("start_off", LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = basesB.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(weightIdx)
        out
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /**
   * Token-budget bin assignment: `bin = start_off div budget`. Documents
   * straddling a boundary belong to the bin their first token lands in —
   * the concat-then-chunk semantics of pre-training sequence packing.
   */
  def assignBins(df: DataFrame, orderCol: String, weightCol: String, budget: Long): DataFrame =
    assignOffsets(df, orderCol, weightCol)
      .withColumn("bin", expr(s"start_off div $budget"))
}
