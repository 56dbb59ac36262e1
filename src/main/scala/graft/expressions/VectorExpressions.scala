package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector-math hot path.
 *
 * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`) do
 * NOT participate in whole-stage codegen — they evaluate interpreted, one
 * lambda invocation per element. For a 12.5M-pair × 64-dim cosine scan
 * (q_embdup at sf0.1) that interpretation overhead dominated the sf0.1
 * bench at ~148 s. These expressions generate a tight Java loop instead
 * (fused dot + both norms in ONE pass), keeping the whole stage inside
 * codegen; they are registered as SQL functions (`graft_cosine`,
 * `graft_dot`) through `SparkSessionExtensions` (see
 * [[graft.GraftExtensions]]) — the standard extension path, no Spark fork.
 *
 * Numeric parity with the oracle is preserved: elements are promoted to
 * double and accumulated left-to-right, the same order as both the HOF
 * formulation and DuckDB's `list_dot_product`.
 */
trait VectorBinaryLoop { self: BinaryExpression =>

  protected def elemAccessor(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => "getFloat"
      case DoubleType => "getDouble"
      case other      => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  protected def elemDouble(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other      => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  def checkVectorInputs(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")
  }
}

/**
 * cos(a, b) = Σaᵢbᵢ / (‖a‖‖b‖), fused in a single loop. NULL when either
 * input is NULL or either norm is zero (matches the HOF formulation's
 * `nullif` ANSI-safe behavior).
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorBinaryLoop {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVectorInputs()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = elemDouble(left, x, i); val yi = elemDouble(right, y, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (elemAccessor(left), elemAccessor(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n     = ctx.freshName("n")
      val i     = ctx.freshName("i")
      val dot   = ctx.freshName("dot")
      val na    = ctx.freshName("na")
      val nb    = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.$ga($i);
         |  double y = (double) $b.$gb($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σaᵢbᵢ in double precision, fused loop (codegen'd). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorBinaryLoop {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVectorInputs()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += elemDouble(left, x, i) * elemDouble(right, y, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ga, gb) = (elemAccessor(left), elemAccessor(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.$ga($i) * (double) $b.$gb($i);
         |}
         |${ev.value} = $dot;
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
