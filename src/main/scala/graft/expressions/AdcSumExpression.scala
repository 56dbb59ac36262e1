package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * The PQ asymmetric-distance sum `adc = Σ_s tab(s)(codes(s))` as ONE
 * compiled loop — the ranking half of the round-14 compiled-PQ pair
 * ([[PqEncodeExpr]] is the build half).
 *
 * The former formulation was `aggregate(zip_with(codes, tab, element_at),
 * 0.0, +)` — two interpreted higher-order functions per row in the one
 * pass whose whole 100 TB story is "reads m bytes per row". This loop
 * folds the m lookup adds LEFT-TO-RIGHT from a 0.0 seed, the identical
 * float-op sequence as both the HOF form and the oracle's
 * `list_aggregate` replay, so the literal-codebook hash checks are
 * untouched. Degenerate parity with zip_with/aggregate: a NULL codes
 * array yields NULL (nullSafeEval); a NULL code ELEMENT yields NULL
 * (`element_at(row, NULL)` → NULL → `acc + NULL` → NULL); a
 * length-m mismatch yields NULL (zip_with null-pads the shorter side).
 * One deliberate divergence, reachable only by a foreign codes column
 * (encode never emits such a code): any out-of-range code yields NULL
 * here, where the HOF's `element_at` returned NULL past the end, RAISED
 * ("SQL array indices start at 1") for code −1 (the lookup computed
 * `element_at(row, 0)`), and indexed from the end only for codes ≤ −2 —
 * misfeatures not preserved.
 */
case class AdcSumExpr(
    child: Expression,
    flatTab: IndexedSeq[Double], // m × ksub, row-major
    ksub: Int)
  extends UnaryExpression {

  require(ksub > 0 && flatTab.length % ksub == 0,
    s"graft_adc: ${flatTab.length} flattened table doubles do not divide into ksub=$ksub rows")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_adc expects an ARRAY<INT> codes column, got $other")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true

  private val m: Int = flatTab.length / ksub

  @transient private lazy val tabArr: Array[Double] = flatTab.toArray

  /** Public for generated code. Returns null (boxed) on any NULL or
    * out-of-range code and on a length-m mismatch — zip_with null-pads
    * the shorter side, so any such pair nulls the whole aggregate. */
  def adcRow(codes: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    if (n != m) return null
    var acc = 0.0
    var s = 0
    while (s < n) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      acc += tabArr(s * ksub + c)
      s += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    adcRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcSum", this, classOf[AdcSumExpr].getName)
    val tmp = ctx.freshName("adc")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |java.lang.Double $tmp = $ref.adcRow($v);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
