package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Tokenizer-APPLY: encode words against a FIXED byte-pair-encoding merge
 * table (Sennrich et al. 2016, arXiv:1508.07909 — the apply side; q_bpe
 * computes the TRAINING pair statistics). This is the step every packing /
 * sampling / budget stage downstream actually consumes: real token counts,
 * not whitespace counts.
 *
 * The merge table is a fixed, in-repo constant obeying the invariant every
 * trained BPE table has BY CONSTRUCTION: a merge's operands are single
 * characters or outputs of strictly EARLIER merges (a pair can only be
 * counted once both symbols exist). Under that invariant, applying the
 * merges SEQUENTIALLY in rank order (one full left-to-right non-overlapping
 * pass per merge) is equivalent to the priority-queue encode loop — a
 * later merge can never create an earlier merge's pair, because the earlier
 * pair's operands predate the later merge's output symbol. Sequential
 * application is what makes the operation a FIXED-DEPTH composition of
 * per-word folds: `Merges.length` chained higher-order aggregates, no
 * iteration-to-fixpoint, no UDF, and a DuckDB oracle can replay the exact
 * fold ([[encodeSql]] generates it from the SAME table, so the two engines
 * cannot drift).
 *
 * Scale shape: encoding is a narrow per-row map — embarrassingly parallel,
 * no shuffle; the merge table broadcasts as part of the plan (it is
 * LITERALS). At 100 TB this is the same plan, wider.
 */
object BpeTokenizer {

  /** The fixed merge table, rank order. Operand invariant (checked by
    * [[validate]] at class-load): each operand is a single char or the
    * output of an earlier merge. English-frequency pairs — the point is a
    * FIXED public table, not a trained artifact. */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"),   // th
    ("th", "e"),  // the
    ("i", "n"),   // in
    ("e", "r"),   // er
    ("a", "n"),   // an
    ("r", "e"),   // re
    ("o", "n"),   // on
    ("s", "t"),   // st
    ("e", "n"),   // en
    ("o", "r"),   // or
    ("an", "d"),  // and
    ("in", "g")   // ing
  )

  private def validate(): Unit = {
    val known = scala.collection.mutable.Set.empty[String]
    Merges.foreach { case (a, b) =>
      require(a.length == 1 || known(a),
        s"merge operand '$a' is neither a char nor an earlier merge output")
      require(b.length == 1 || known(b),
        s"merge operand '$b' is neither a char nor an earlier merge output")
      known += (a + b)
    }
  }
  validate()

  /** One merge pass: left-to-right, non-overlapping replacement of the
    * adjacent pair (a, b) by a+b — an accumulating fold. try_element_at
    * (NULL on the empty accumulator, which fails the `when` and appends)
    * keeps the fold ANSI-safe.
    *
    * DEFINITIONAL form only: the fold's accumulator is rebuilt by
    * `concat(slice(...))` per element (O(len²) per word, interpreted), so
    * the production path is the codegen expression below — this fold is
    * kept as the parity witness BpeTokenizerSpec pins the expression
    * against (the cosine/winnow precedent, SURVEY §4.2). */
  private def mergePass(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** STRING word → ARRAY<STRING> of BPE symbols under [[Merges]]. */
  def encode(word: Column): Column =
    Merges.foldLeft(split(word, "")) { case (syms, (a, b)) => mergePass(syms, a, b) }

  /** Definitional HOF document encode — the parity witness for
    * [[encodeDoc]] (never on the production path). */
  def encodeDocHof(text: Column): Column =
    flatten(transform(split(text, " +"), wd => encode(wd)))

  /** The whole document's token stream: every word encoded, concatenated
    * in order. Symbols contain no spaces, so joining the stream with a
    * single space is a lossless serialization of the token SEQUENCE.
    * Production path: the `graft_bpe_encode` codegen expression
    * ([[graft.expressions.BpeEncode]]), O(len·merges) per doc inside
    * whole-stage codegen, bit-identical to [[encodeDocHof]]. */
  def encodeDoc(text: Column): Column =
    call_function("graft_bpe_encode", text)

  /** Per-document BPE token COUNT without materializing the token array —
    * what packing/budget stages actually consume (q_pack_bpe). Equals
    * `size(encodeDoc(text))` by construction (shared walk in
    * [[graft.expressions.BpeEncode]]). */
  def tokenCount(text: Column): Column =
    call_function("graft_bpe_count", text)

  /** DuckDB replay of [[encode]] applied to the SQL expression `wd`,
    * generated from the SAME merge table so the two engines share one
    * source of truth. DuckDB's list_reduce has no initial accumulator; it
    * seeds with the first element, which is identical to the empty-init
    * fold here because the first element can never merge. Elements are
    * wrapped as single-symbol lists so the accumulator is a list. */
  def encodeSql(wd: String): String =
    Merges.foldLeft(s"string_split($wd, '')") { case (prev, (a, b)) =>
      s"list_reduce(list_transform($prev, s -> [s]), (acc, x) -> " +
        s"CASE WHEN acc[-1] = '$a' AND x[1] = '$b' " +
        s"THEN acc[1:len(acc)-1] || ['$a$b'] ELSE acc || x END)"
    }
}
