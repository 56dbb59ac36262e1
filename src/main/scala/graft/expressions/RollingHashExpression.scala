package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Polynomial rolling hash of a string's codepoints —
 * `h₀=SEED; hᵢ = (hᵢ₋₁·BASE + cᵢ) mod M` — the classic Rabin-Karp document
 * fingerprint. Unlike md5, the recurrence admits O(1) sliding-window
 * updates, which is what winnowing-style chunk fingerprinting needs at
 * scale; the doc-level form here is the oracle-checkable anchor (DuckDB
 * mirrors it with `list_reduce` over `ascii()` codes).
 *
 * SEED/BASE/M are fixed (7 / 31 / 1e9+7) and small enough that
 * BASE·M + c < 2⁶³ — no overflow in long arithmetic.
 */
object RollingHash {
  val Seed: Long = 7L
  val Base: Long = 31L
  val Mod: Long  = 1000000007L

  /** Continue the polynomial fold over `s`'s codepoints from accumulator
    * `h0`. THE single definition of the Rabin-Karp recurrence — the
    * bigram-continuation trick in [[ClfScore]]/[[HashedScore]] and the
    * doc fingerprint here must stay the same fold, or their "hash(a⧺' '⧺b)
    * = fold(fold(hash(a),' '),b)" identity silently breaks (ADVICE r13). */
  def hashCont(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Shared by eval and generated code (one call per row; the loop JITs). */
  def hash(s: UTF8String): Long = hashCont(Seed, s.toString)
}

/** STRING → LONG rolling-hash fingerprint (codegen'd). */
case class RollingHashFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_rollhash expects a STRING document, got ${child.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.RollingHash.hash($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
