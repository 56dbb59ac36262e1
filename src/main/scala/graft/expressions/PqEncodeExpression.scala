package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Product-quantization encode as ONE compiled loop — the third instance
 * of the round-14 inline-expression fix ([[CentroidArgminExpr]],
 * [[CoarsePruneExpr]] are the other two).
 *
 * [[graft.operators.Ann.pqEncode]] used to build m × ksub
 * `squaredL2Distance` columns per row — and that helper is a
 * `zip_with`+`aggregate` HIGHER-ORDER function, which never participates
 * in whole-stage codegen (this file's documented reason for existing):
 * 128 interpreted per-element lambda folds per row put the PQ trio at
 * the top of the whole bench (q_pq/q_pq_idx/q_ivfpq ≈ 6.2–6.8 s each at
 * sf0.1, ~34 µs/row for a 200k-row corpus whose whole encode is ~10⁸
 * FLOPs). This expression computes the identical codes in one JIT-hot
 * loop over the m × ksub × dsub codebook literal (riding along as an
 * expression reference):
 *
 *   code_s = the FIRST j minimizing Σ_i (v[s·dsub+i] − cb_s,j[i])²
 *            under java.lang.Double.compare,
 *
 * the same left-to-right 0.0-seeded fold with per-element double
 * promotion as the HOF formulation, and the same first-min tie rule as
 * `array_position(ds, array_min(ds)) − 1`. The DuckDB oracle replay
 * (list_transform + list_reduce from the recorded codebook literals) is
 * untouched — values are bit-identical, pinned by AnnSpec's retired-
 * formulation equality spec and the driver-replay encode-parity spec.
 *
 * Degenerate-input parity with the retired form: a NULL vector encodes
 * to NULL codes (`when(isNotNull …)` there, nullSafeEval here); a NULL
 * element or a vector too short to cover subspace s nulls ONLY code_s
 * (there: `zip_with` null-pads → the distance fold returns NULL for
 * every codebook row of that subspace → `array_min` of all-NULL is NULL
 * → `array_position(ds, NULL)` is NULL).
 */
case class PqEncodeExpr(
    child: Expression,
    flatCodebooks: IndexedSeq[Double], // m × ksub × dsub, row-major
    m: Int,
    ksub: Int)
  extends UnaryExpression {

  require(m > 0 && ksub > 0 && flatCodebooks.length % (m * ksub) == 0,
    s"graft_pq_encode: ${flatCodebooks.length} flattened codebook doubles do not divide " +
      s"into m=$m × ksub=$ksub codewords")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_encode expects an ARRAY<FLOAT|DOUBLE> vector, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  private val dsub: Int = flatCodebooks.length / (m * ksub)

  @transient private lazy val cbArr: Array[Double] = flatCodebooks.toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Public for generated code (one call per row; the loops JIT). */
  def encodeRow(vec: ArrayData): ArrayData = {
    val n     = vec.numElements()
    val codes = new Array[Any](m)
    var s = 0
    while (s < m) {
      val off = s * dsub
      // subspace-s parity with the zip_with formulation: an out-of-range
      // or NULL element nulls this code only
      var usable = off + dsub <= n
      if (usable) {
        var i = off
        while (i < off + dsub && usable) {
          if (vec.isNullAt(i)) usable = false
          i += 1
        }
      }
      if (!usable) codes(s) = null
      else {
        val x = new Array[Double](dsub)
        var i = 0
        if (isFloat) while (i < dsub) { x(i) = vec.getFloat(off + i).toDouble; i += 1 }
        else while (i < dsub) { x(i) = vec.getDouble(off + i); i += 1 }
        var best  = 0.0
        var bestJ = -1
        var j = 0
        val bookBase = s * ksub * dsub
        while (j < ksub) {
          var d = 0.0
          var k = 0
          val base = bookBase + j * dsub
          while (k < dsub) { val t = x(k) - cbArr(base + k); d += t * t; k += 1 }
          if (bestJ < 0 || java.lang.Double.compare(d, best) < 0) { best = d; bestJ = j }
          j += 1
        }
        codes(s) = bestJ
      }
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    encodeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encodeRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
