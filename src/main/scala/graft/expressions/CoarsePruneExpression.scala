package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Triangle-inequality coarse-group pruning for two-level exact
 * nearest-centroid assignment ([[graft.operators.Ann.assignCentroidPruned]])
 * — the g ≥ 128 regime (VERDICT r13 item 2).
 *
 * The inline formulation builds 3·g expressions per row (g coarse
 * distances, a g-wide `array_min`, a g-wide conditional explode), which
 * leaves the codegen-viable regime past ~128 coarse cells — exactly the
 * cliff two-level assignment exists to avoid, re-entered one data decade
 * past c ≈ 16k (g = √c). This expression is the same math as ONE compiled
 * loop: given the flattened coarse-center matrix, per-group ‖g_G‖², and
 * slack-inflated radii (all driver-side model artifacts riding along as
 * expression references), it emits the surviving group-id array
 *
 *   ub = min_G (db_G + r_G),   survivors = { G : db_G − r_G ≤ ub }
 *
 * with db_G = √max(0, ‖v‖² − 2⟨v,g_G⟩ + ‖g_G‖²) — the identical
 * formula, per-element double promotion, and left-to-right accumulation
 * as the inline `dotLit` path, so the two coarse plans prune identically
 * up to FP noise that the radii slack already absorbs (inflating r only
 * ADDS candidates — the safe direction; the fine level re-scores
 * survivors exactly, so pruning differences can never change the
 * assignment). Per-row cost is O(g·dim) in one JIT'd loop, no g-wide
 * array constructs, no shuffle; g is bounded only by the broadcastable
 * model size, not by codegen viability.
 *
 * A vector with a NULL element emits an EMPTY survivor set — the same
 * row-drop the inline plan produces (null distance → null comparisons →
 * every gid slot null → filtered), keeping the two coarse paths
 * bit-equivalent on degenerate inputs.
 */
case class CoarsePruneExpr(
    child: Expression,
    flatCenters: IndexedSeq[Double], // g × dim, row-major
    gg: IndexedSeq[Double],          // ‖g_G‖² per group (driver-side Scala fold)
    radii: IndexedSeq[Double])       // slack-inflated member radii per group
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_coarse_prune expects an ARRAY<FLOAT|DOUBLE> vector, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val g: Int   = gg.length
  private val dim: Int = if (g == 0) 0 else flatCenters.length / g

  @transient private lazy val centersArr: Array[Double] = flatCenters.toArray
  @transient private lazy val ggArr: Array[Double]      = gg.toArray
  @transient private lazy val radiiArr: Array[Double]   = radii.toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Public for generated code (one call per row; the loops JIT). */
  def survivorsRow(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return CoarsePruneExpr.Empty
      i += 1
    }
    // promote once — mirrors graft_dot's per-element double promotion
    val x = new Array[Double](n)
    i = 0
    if (isFloat) while (i < n) { x(i) = vec.getFloat(i).toDouble; i += 1 }
    else while (i < n) { x(i) = vec.getDouble(i); i += 1 }
    var v2 = 0.0
    i = 0
    while (i < n) { v2 += x(i) * x(i); i += 1 }
    val m  = math.min(n, dim) // graft_dot folds min(length) elements
    val db = new Array[Double](g)
    var ub = Double.PositiveInfinity
    var gi = 0
    while (gi < g) {
      var dot  = 0.0
      var k    = 0
      val base = gi * dim
      while (k < m) { dot += x(k) * centersArr(base + k); k += 1 }
      val d = math.sqrt(math.max(0.0, v2 - 2.0 * dot + ggArr(gi)))
      db(gi) = d
      val u = d + radiiArr(gi)
      if (u < ub) ub = u
      gi += 1
    }
    var cnt = 0
    gi = 0
    while (gi < g) { if (db(gi) - radiiArr(gi) <= ub) cnt += 1; gi += 1 }
    val out = new Array[Int](cnt)
    var o   = 0
    gi = 0
    while (gi < g) {
      if (db(gi) - radiiArr(gi) <= ub) { out(o) = gi; o += 1 }
      gi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    survivorsRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("coarsePrune", this, classOf[CoarsePruneExpr].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.survivorsRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CoarsePruneExpr {
  private val Empty = new GenericArrayData(Array.empty[Int])
}
