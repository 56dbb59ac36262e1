package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * The per-PROBE ADC lookup table `tab(s)(j) = ‖p_s − cb_s,j‖²` as ONE
 * compiled loop — the probe-side half of the batch-PQ pair
 * ([[AdcDynExpr]] consumes the result per candidate row). Where
 * [[graft.operators.Ann.pqAdcTable]] computes this table driver-side
 * for a SINGLE literal probe, this expression computes it inside the
 * plan for EVERY row of a probe frame, which is what lets
 * [[graft.operators.Ann.pqKnnJoin]] stay fully distributed: the table
 * is built once per probe (the small side), broadcast with it, and the
 * corpus-side pair scan then does m lookup adds per (row, probe) — no
 * driver collect of the probe set, no per-probe literal plans.
 *
 * Float-op parity: each entry is the same left-to-right 0.0-seeded
 * (x−y)² fold as [[PqEncodeExpr]]'s distances and pqAdcTable's loop, so
 * the DuckDB oracle replays entries bit-for-bit with the SAME
 * list_transform/list_aggregate fragments it uses for encode distances.
 * Degenerate inputs: NULL vector → NULL table; a NULL element or a
 * vector too short for subspace s → the ksub entries of subspace s are
 * NULL (the [[PqEncodeExpr]] per-subspace convention), which
 * [[AdcDynExpr]] then propagates to a NULL adc for any candidate —
 * such a probe ranks nothing, consistent with the NULL-codes rule.
 */
case class PqTableExpr(
    child: Expression,
    flatCodebooks: IndexedSeq[Double], // m × ksub × dsub, row-major
    m: Int,
    ksub: Int)
  extends UnaryExpression {

  require(m > 0 && ksub > 0 && flatCodebooks.length % (m * ksub) == 0,
    s"graft_adc_table: ${flatCodebooks.length} flattened codebook doubles do not divide " +
      s"into m=$m × ksub=$ksub codewords")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_adc_table expects an ARRAY<FLOAT|DOUBLE> probe vector, got $other")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  private val dsub: Int = flatCodebooks.length / (m * ksub)

  @transient private lazy val cbArr: Array[Double] = flatCodebooks.toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Public for generated code (one call per probe row). */
  def tableRow(vec: ArrayData): ArrayData = {
    val n   = vec.numElements()
    val out = new Array[Any](m * ksub)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var usable = off + dsub <= n
      if (usable) {
        var i = off
        while (i < off + dsub && usable) {
          if (vec.isNullAt(i)) usable = false
          i += 1
        }
      }
      if (usable) {
        val x = new Array[Double](dsub)
        var i = 0
        if (isFloat) while (i < dsub) { x(i) = vec.getFloat(off + i).toDouble; i += 1 }
        else while (i < dsub) { x(i) = vec.getDouble(off + i); i += 1 }
        val bookBase = s * ksub * dsub
        var j = 0
        while (j < ksub) {
          var d = 0.0
          var k = 0
          val base = bookBase + j * dsub
          while (k < dsub) { val t = x(k) - cbArr(base + k); d += t * t; k += 1 }
          out(s * ksub + j) = d
          j += 1
        }
      } // else: the ksub entries of subspace s stay null
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    tableRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", this, classOf[PqTableExpr].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.tableRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
