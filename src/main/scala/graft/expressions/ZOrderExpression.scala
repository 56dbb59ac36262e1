package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Morton (Z-order) interleave of two keys — the space-filling-curve
 * clustering key behind multi-dimensional data skipping: sorting a table
 * by `graft_zorder(x, y)` keeps BOTH x-locality and y-locality inside each
 * file/row group, so parquet min/max stats prune scans filtered on either
 * column (1-D range clustering, q_clusterby, prunes only its sort column).
 *
 * Each input contributes its low [[ZOrder.Bits]] bits (21 → a 42-bit
 * code, non-negative in a long). Inputs are masked, not range-checked:
 * clustering only needs a consistent total order, and masking keeps the
 * expression total over all longs. Codegen'd via a shared static loop —
 * one virtual call per row, the loop itself JITs flat.
 */
object ZOrder {
  val Bits: Int  = 21
  val Mask: Long = (1L << Bits) - 1

  /** Shared by eval and generated code. */
  def interleave(x: Long, y: Long): Long = {
    val mx = x & Mask
    val my = y & Mask
    var z  = 0L
    var i  = 0
    while (i < Bits) {
      z |= ((mx >> i) & 1L) << (2 * i)
      z |= ((my >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** (LONG, LONG) → LONG Morton code (codegen'd). */
case class ZOrderCode(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder expects (BIGINT, BIGINT), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ZOrder.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
