package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * `graft_bloom_contains(key BIGINT, bloom BINARY) -> BOOLEAN` — membership
 * probe against a serialized [[org.apache.spark.util.sketch.BloomFilter]].
 *
 * The filter bytes arrive as a FOLDABLE literal child (the same design as
 * Spark's internal runtime-filter `BloomFilterMightContain`): the literal
 * is evaluated once per executor into a transient cached filter, and the
 * generated code probes that cached object directly — the byte array is
 * shipped with the task binary exactly once per stage, never per row.
 * False positives are possible by construction, false negatives are not —
 * so the probe is only ever a PRE-filter ahead of an exact join (see
 * [[graft.operators.BloomPrune]]); it can cut shuffle input, not replace
 * the join.
 */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects a BIGINT key, got ${left.dataType}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects a foldable BINARY bloom-filter literal")
    else if (right.eval() == null)
      // a NULL literal would otherwise NPE lazily inside BloomFilter.readFrom
      // on the executor — reject it at analysis time instead
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains bloom-filter literal must not be NULL")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(key: Any, bloomBytes: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) => s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
