package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Flat exact nearest-centroid argmin as ONE compiled loop — the small-c
 * sibling of [[CoarsePruneExpr]] and the round-14 fix for the second
 * instance of the inline-expression JIT cliff.
 *
 * [[graft.operators.Ann.assignCentroid]] used to inline c distance
 * expressions plus a c-wide `array_min` + `array_position` pair. That
 * form is semantically exact but physically interpreted: even at c = 64
 * the generated whole-stage methods cross HotSpot's JIT size ceiling
 * (DontCompileHugeMethods, 8 KB bytecode), so the stage runs in the
 * bytecode interpreter — measured on the factor-1000 slice at ~600 s for
 * a 2M-row assignment that this loop does in seconds. The semantics are
 * preserved exactly:
 *
 *   d_j = −2·⟨v,c_j⟩ + ‖c_j‖²   (dot folded left-to-right over
 *          min(|v|, dim) elements with per-element double promotion —
 *          the [[VectorBinaryLoop]] / `graft_dot` fold),
 *   cid  = the FIRST j minimizing d_j under java.lang.Double.compare
 *
 * which is bit-for-bit `array_position(ds, array_min(ds)) − 1`: Spark's
 * double ordering IS Double.compare (NaN largest and self-equal, −0 < 0),
 * `array_min` takes the least element under it, and `array_position`
 * returns the first index whose element is ordering-equivalent to that
 * least value — i.e. the first attained minimum. Ties between duplicate
 * centroids therefore keep the lowest cid, the rule every oracle replay
 * and [[graft.operators.Ann.assignCentroidJoin]]'s `min(cid)` pass share
 * (`Probe --semdedup-cert` leg 1 pins the two plans' equality at scale).
 *
 * The c × dim model rides as an expression reference (same pattern as
 * [[CoarsePruneExpr]]), so c is bounded by broadcastable model size, not
 * codegen width; element access mirrors [[VectorBinaryLoop]] exactly
 * (getFloat/getDouble, no per-element null test — a NULL element reads
 * as 0, the same value the inline dot-product fold consumed). A NULL
 * vector yields a NULL cid, as the inline form's null-propagating
 * distance expressions did.
 */
case class CentroidArgminExpr(
    child: Expression,
    flatCenters: IndexedSeq[Double], // c × dim, row-major
    cc: IndexedSeq[Double])          // ‖c_j‖² per centroid (driver-side Scala fold)
  extends UnaryExpression {

  require(cc.nonEmpty && flatCenters.length % cc.length == 0,
    s"graft_centroid_argmin: ${flatCenters.length} flattened model doubles do not divide " +
      s"into ${cc.length} centroids")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_centroid_argmin expects an ARRAY<FLOAT|DOUBLE> vector, got $other")
    }

  override def dataType: DataType = IntegerType

  private val c: Int   = cc.length
  private val dim: Int = flatCenters.length / c

  @transient private lazy val centersArr: Array[Double] = flatCenters.toArray
  @transient private lazy val ccArr: Array[Double]      = cc.toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Public for generated code (one call per row; the loops JIT). */
  def argminRow(vec: ArrayData): Int = {
    val n = vec.numElements()
    // promote once — mirrors graft_dot's per-element double promotion
    val x = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { x(i) = vec.getFloat(i).toDouble; i += 1 }
    else while (i < n) { x(i) = vec.getDouble(i); i += 1 }
    val m = math.min(n, dim) // graft_dot folds min(length) elements
    var best  = 0.0
    var bestC = -1
    var j = 0
    while (j < c) {
      var dot  = 0.0
      var k    = 0
      val base = j * dim
      while (k < m) { dot += x(k) * centersArr(base + k); k += 1 }
      val d = -2.0 * dot + ccArr(j)
      if (bestC < 0 || java.lang.Double.compare(d, best) < 0) { best = d; bestC = j }
      j += 1
    }
    bestC
  }

  override def nullSafeEval(input: Any): Any =
    argminRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidArgmin", this, classOf[CentroidArgminExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.argminRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
