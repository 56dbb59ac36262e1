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

  /**
   * GROUPED two-pass prefix sum: `start_off` = the exclusive running sum of
   * `weightCol` in ascending `orderCol` order WITHIN each `groupCol` value —
   * exactly `sum() OVER (PARTITION BY group ORDER BY order)`, and
   * value-identical to filtering per group and running [[assignOffsets]] on
   * each slice. One range shuffle on (group, order) and one pass-1 totals
   * job replace |groups| shuffles and |groups| driver round-trips — AND the
   * caller's upstream plan executes once instead of once per group (the
   * round-15 q_curate finding: its dedup→LSH→decontaminate chain re-ran
   * per split branch). Mechanics are [[assignOffsets]]'s, generalized:
   * per-partition totals are kept PER GROUP (groups are contiguous under
   * the (group, order) range partitioning, but a partition may span several
   * groups and a group several partitions), the driver prefix-sums each
   * group's totals independently in partition order, and pass 2 reseeds the
   * accumulator at every group change. `orderCol` must be unique within a
   * group; `groupCol` values must be non-null (ENFORCED in pass 1 — a null
   * group would otherwise silently form an undocumented null group via
   * reference-equality quirks instead of failing loudly).
   *
   * DRIVER-STATE BOUND (VERDICT r15): pass 1 collects one (group, total)
   * entry per (partition, group-overlapping-it) — ≤ groups + partitions
   * entries when groups are contiguous (each partition adds at most one
   * boundary-spanning group), but still O(groups) driver memory. That is
   * the scheme's contract: group cardinality must be model-artifact-sized
   * (splits, shards, tenants), NEVER data-sized. `maxDriverEntries` makes
   * the contract loud: beyond it the call fails with instructions instead
   * of silently OOMing the driver at 100 TB. A data-sized `groupCol`
   * belongs in the per-group window formulation (one partition per group)
   * or a re-keyed pipeline, not here.
   */
  def assignOffsetsBy(
      df: DataFrame, groupCol: String, orderCol: String, weightCol: String,
      partitions: Int = 0, maxDriverEntries: Long = 4L * 1000 * 1000): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(weightCol).dataType == LongType,
      s"$weightCol must be LongType (cast before calling)")
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val ordered = df.repartitionByRange(n, col(groupCol), col(orderCol))
      .sortWithinPartitions(groupCol, orderCol)
    val rdd       = ordered.rdd // shared by both passes → one shuffle
    val groupIdx  = ordered.schema.fieldIndex(groupCol)
    val weightIdx = ordered.schema.fieldIndex(weightCol)

    // pass 1: per-(partition, group) totals, group-contiguous within the
    // partition, so insertion order IS the group order the range shuffle
    // established
    val partTotals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
        it.foreach { r =>
          val g = r.get(groupIdx)
          require(g != null,
            s"assignOffsetsBy: null $groupCol value (partition $pid) — " +
              "the grouped prefix sum requires non-null groups")
          m.update(g, m.getOrElse(g, 0L) + r.getLong(weightIdx))
        }
        Iterator((pid, m.toVector))
      }
      .collect()
      .sortBy(_._1)
    val driverEntries = partTotals.iterator.map(_._2.size.toLong).sum
    require(driverEntries <= maxDriverEntries,
      s"assignOffsetsBy: pass-1 collected $driverEntries (partition, group) " +
        s"totals — above the $maxDriverEntries driver-state bound. " +
        s"'$groupCol' looks data-sized; use a per-group window (one " +
        "partition per group) or re-key the pipeline instead of the " +
        "grouped prefix sum, whose driver state is O(groups).")
    // driver prefix: bases((pid, g)) = that group's total over partitions < pid
    val running = scala.collection.mutable.HashMap.empty[Any, Long]
    val bases: Map[(Int, Any), Long] = partTotals.flatMap { case (pid, gs) =>
      gs.map { case (g, s) =>
        val b = running.getOrElse(g, 0L)
        running.update(g, b + s)
        ((pid, g), b)
      }
    }.toMap
    val basesB = spark.sparkContext.broadcast(bases)

    val schema = StructType(ordered.schema.fields :+ StructField("start_off", LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      val bs = basesB.value
      var cur: Any   = null
      var started    = false
      var acc        = 0L
      it.map { r =>
        val g = r.get(groupIdx)
        if (!started || g != cur) { cur = g; started = true; acc = bs((pid, g)) }
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(weightIdx)
        out
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** [[assignBins]] per group — see [[assignOffsetsBy]]. */
  def assignBinsBy(
      df: DataFrame, groupCol: String, orderCol: String, weightCol: String,
      budget: Long): DataFrame =
    assignOffsetsBy(df, groupCol, orderCol, weightCol)
      .withColumn("bin", expr(s"start_off div $budget"))
}
