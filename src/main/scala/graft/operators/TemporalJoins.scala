package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators the reference lacks (SURVEY §2.2 "as-of /
 * interval join" row), built Spark-first:
 *
 *  - [[asofBackward]] — as-of join WITHOUT a range join: tag both sides,
 *    union, and carry the most recent right-side value forward with a
 *    single window pass. One shuffle (on the partition key), no
 *    O(left × right-window) blowup — this is the shape that survives
 *    100 TB, unlike the naive `BETWEEN` join whose BNLJ explodes.
 *  - [[rangeJoinBucketed]] — bounded-interval range join as an EQUI-join
 *    on a time bucket plus an exact refinement filter: the left side
 *    explodes to the (constant number of) buckets its interval covers, the
 *    join shuffles on (bucket, keys) like any hash join, and the final
 *    predicate trims the bucket slack. Catalyst sees a plain equi-join, so
 *    AQE/skew handling all apply; cost ∝ matches, not |L|×|R|.
 */
object TemporalJoins {

  /**
   * For every left row, attach the greatest `rightVal` among right rows in
   * the same `partitionCol` group with `rightTime <= leftTime` (backward
   * as-of, ties included; among equal times the max `rightVal` wins).
   * Right rows with no match yield NULL — filter or join-semantics at the
   * call site.
   */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      partitionCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValCol: String
  ): DataFrame = {
    val l = left.select(
      col(partitionCol).as("__p"),
      col(leftTimeCol).as("__t"),
      lit(1).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__row"),
      lit(null).cast(right.schema(rightValCol).dataType).as("__v"))
    val r = right.select(
      col(partitionCol).as("__p"),
      col(rightTimeCol).as("__t"),
      lit(0).as("__side"), // right rows sort BEFORE left rows at equal time
      lit(null).cast(l.schema("__row").dataType).as("__row"),
      col(rightValCol).as("__v"))
    val w = Window
      .partitionBy("__p")
      .orderBy(col("__t"), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last("__v", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__row.*"), col("__asof").as(s"asof_$rightValCol"))
  }

  /**
   * Right rows with `rightTime ∈ [leftTime, leftTime + delta)` (plus any
   * extra equi-keys), as an equi-join on a `delta`-sized time bucket. The
   * left side duplicates into the 2 covering buckets — constant fan-out,
   * then standard hash join machinery.
   */
  def rangeJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      leftTimeCol: String,
      rightTimeCol: String,
      deltaSeconds: Long,
      extraKeys: Seq[(String, String)] = Seq.empty
  ): DataFrame = {
    // `unix_micros` accepts TIMESTAMP only; a caller that bypassed
    // Tables.readEvents may hand us a TIMESTAMP_NTZ (the testdata's current
    // on-disk encoding) or raw ns-long time column — route through the SAME
    // normalizer as every ingress, so all encodings behave identically here
    // and an unsupported one fails with the loud named error, not a
    // DATATYPE_MISMATCH from deep inside the join. The output then carries
    // TimestampType for that column, same as every Tables-loaded frame.
    val left0   = graft.Tables.normalizeTs(left, leftTimeCol)
    val right0  = graft.Tables.normalizeTs(right, rightTimeCol)
    val deltaUs = deltaSeconds * 1000000L
    val lb      = floor(unix_micros(col(leftTimeCol)) / deltaUs)
    val rb      = floor(unix_micros(col(rightTimeCol)) / deltaUs)
    val l = left0
      .withColumn("__bucket", explode(array(lb, lb + 1)))
    val r = right0.withColumn("__bucket", rb)
    val cond = extraKeys
      .map { case (lk, rk) => l(lk) === r(rk) }
      .foldLeft(l("__bucket") === r("__bucket"))(_ && _)
    l.join(r, cond)
      // qualify via the dataset references like the join condition — bare
      // col(...) is AMBIGUOUS_REFERENCE whenever both sides share the time
      // column name (the natural ts-vs-ts call)
      .where(
        r(rightTimeCol) >= l(leftTimeCol) &&
          unix_micros(r(rightTimeCol)) < unix_micros(l(leftTimeCol)) + deltaUs)
      .drop("__bucket")
  }
}
