package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * The ADC lookup sum over a NON-literal table column:
 * `adc = Σ_s tab(s·ksub + codes(s))` where `tab` arrives per row (the
 * broadcast probe side of [[graft.operators.Ann.pqKnnJoin]], built by
 * [[PqTableExpr]]) instead of riding as an expression literal the way
 * [[AdcSumExpr]]'s does. Same 0.0-seeded left-to-right fold, so a
 * single-probe [[AdcSumExpr]] plan and this batch plan produce
 * bit-identical distances for the same (codes, table) pair — and the
 * DuckDB oracle replays the sum as the same explicit `+` chain.
 *
 * NULL semantics (the [[AdcSumExpr]] rules, extended to the table
 * side): NULL codes or NULL tab → NULL (nullSafeEval); a NULL code
 * element, an out-of-range code, a length mismatch (tab ≠ m·ksub), or
 * a NULL TABLE ENTRY (a probe with a NULL element nulls its whole
 * subspace in [[PqTableExpr]]) → NULL — such a (probe, candidate) pair
 * ranks nowhere, consistent with the codes-side convention.
 */
case class AdcDynExpr(
    codes: Expression,
    tab: Expression,
    ksub: Int)
  extends BinaryExpression {

  require(ksub > 0, s"graft_adc_dyn: ksub must be positive, got $ksub")

  override def left: Expression  = codes
  override def right: Expression = tab

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (codes.dataType, tab.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (c, t) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_adc_dyn expects (ARRAY<INT> codes, ARRAY<DOUBLE> table), got ($c, $t)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true

  /** Public for generated code. */
  def adcRow(cs: ArrayData, tb: ArrayData): java.lang.Double = {
    val n = cs.numElements()
    if (tb.numElements() != n * ksub) return null
    var acc = 0.0
    var s = 0
    while (s < n) {
      if (cs.isNullAt(s)) return null
      val c = cs.getInt(s)
      if (c < 0 || c >= ksub) return null
      val idx = s * ksub + c
      if (tb.isNullAt(idx)) return null
      acc += tb.getDouble(idx)
      s += 1
    }
    acc
  }

  override def nullSafeEval(codesIn: Any, tabIn: Any): Any =
    adcRow(codesIn.asInstanceOf[ArrayData], tabIn.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcDyn", this, classOf[AdcDynExpr].getName)
    val tmp = ctx.freshName("adc")
    nullSafeCodeGen(ctx, ev, (c, t) =>
      s"""
         |java.lang.Double $tmp = $ref.adcRow($c, $t);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, tab = newRight)
}
