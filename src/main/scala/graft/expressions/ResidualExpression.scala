package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * The IVFADC residual `r = v − centroid(cid)` as ONE compiled loop —
 * the fourth member of the round-14 compiled-model family
 * ([[CentroidArgminExpr]], [[CoarsePruneExpr]], [[PqEncodeExpr]],
 * [[AdcSumExpr]]): the C×dim coarse model rides as an expression
 * reference and the per-row work is a plain JIT-hot subtraction loop,
 * composing with `graft_pq_encode` downstream inside one whole-stage
 * codegen span (each expression contributes only a method call, so the
 * fused stage stays far under HotSpot's 8 KB bytecode ceiling that the
 * interpreted `zip_with` formulation was built to escape).
 *
 * Jégou, Douze, Schmid (TPAMI 2011) §IV: IVFADC's accuracy at large C
 * comes from product-quantizing RESIDUALS rather than raw vectors —
 * the coarse quantizer absorbs the coarse position and the codebooks
 * spend their 2^(m·log₂ksub) cells on the much tighter residual
 * distribution. This expression is the per-row half of that: downstream
 * of [[graft.operators.Ann.assignCentroid]]'s compiled argmin it turns
 * `(v, cid)` into the double-promoted residual the shared PQ encode
 * loop then codes.
 *
 * Semantics (each replayable in the DuckDB literal oracle):
 *  - element i of the result = `v[i] − centroids(cid)(i)`, with v[i]
 *    promoted float→double first (the [[graft.functions.Similarity]]
 *    promotion contract), so the oracle's
 *    `list_transform(range(…), i -> v[i] - cv[i])` over
 *    `CAST(embedding AS DOUBLE[])` is bit-identical;
 *  - a NULL element stays a NULL element (NULL − x is NULL), so the PQ
 *    encode downstream nulls exactly the subspaces it would have nulled
 *    on the raw vector — degenerate parity with the non-residual path;
 *  - NULL vector or NULL cid → NULL result (a row in no cell has no
 *    residual — [[graft.operators.Ann.semAssigned]]'s convention);
 *  - a cid outside [0, C) or a vector whose length ≠ dim → NULL result
 *    (reachable only by foreign input: `assignCentroid` emits neither).
 */
case class ResidualExpr(
    vec: Expression,
    cid: Expression,
    flatCentroids: IndexedSeq[Double], // C × dim, row-major
    dim: Int)
  extends BinaryExpression {

  require(dim > 0 && flatCentroids.length % dim == 0,
    s"graft_residual: ${flatCentroids.length} flattened centroid doubles do not divide " +
      s"into dim=$dim rows")

  override def left: Expression  = vec
  override def right: Expression = cid

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, cid.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (v, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_residual expects (ARRAY<FLOAT|DOUBLE> vector, INT cid), got ($v, $c)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean  = true

  private val c: Int = flatCentroids.length / dim

  @transient private lazy val centArr: Array[Double] = flatCentroids.toArray
  @transient private lazy val isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Public for generated code (one call per row; the loop JITs).
    * Returns null on an out-of-range cid or a dim-mismatched vector. */
  def residualRow(v: ArrayData, cellId: Int): ArrayData = {
    if (cellId < 0 || cellId >= c || v.numElements() != dim) return null
    val base = cellId * dim
    val out  = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      if (!v.isNullAt(i)) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = x - centArr(base + i)
      } // else: stays null
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(vecIn: Any, cidIn: Any): Any =
    residualRow(vecIn.asInstanceOf[ArrayData], cidIn.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residual", this, classOf[ResidualExpr].getName)
    val tmp = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, (v, cc) =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp = $ref.residualRow($v, $cc);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cid = newRight)
}
