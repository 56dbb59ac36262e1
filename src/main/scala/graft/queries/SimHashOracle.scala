package graft.queries

/**
 * DuckDB replay of the [[graft.expressions.SimHash64]] signature — the
 * oracle side of q_simhash.
 *
 * The Spark side hashes each whitespace token with XXH64(seed=42) and
 * folds 64 bit votes into a signed long. XXH64 is not built into DuckDB,
 * so this generator emits SQL that replays the hash itself in 128-bit
 * (HUGEINT) arithmetic: every mod-2^64 multiply is decomposed into
 * 32-bit halves (`al*bl + ((ah*bl + al*bh) mod 2^32) << 32`), rotates
 * become multiply+divide pairs, and the whole per-token chain is emitted
 * as ~45 NESTED subqueries (one new column each) — nesting, not lateral
 * column aliases, because DuckDB expands lateral aliases by substitution
 * and the 4-reference multiply steps would blow the expression tree up
 * exponentially (measured: the alias form never finished on 27k tokens;
 * the nested form runs in ~1.4 s).
 *
 * Corpus contract this relies on (asserted by DedupSpec's "corpus
 * contract" test over every driver-testdata SF): tokens are ASCII and at
 * most 8 bytes, so only XXH64's short path is needed — one optional
 * 8-byte round, one optional 4-byte chunk, and up to three tail bytes.
 * The generic ≥32-byte stripe loop is NOT replayed; a corpus with longer
 * tokens would need it. The [[graft.tools.ScaleUp]] rehearsal dirs
 * PRESERVE the contract (per-copy token tags are applied tag-then-
 * truncate back to 8 ASCII bytes), so the full oracle sweep — this
 * replay included — runs against the sf1 slice too.
 */
object SimHashOracle {

  private val M32 = 4294967296L
  private val M64 = BigInt(2).pow(64)
  private val P1  = BigInt("11400714785074694791")
  private val P2  = BigInt("14029467366897019727")
  private val P3  = BigInt("1609587929392839161")
  private val P4  = BigInt("9650029242287828579")
  private val P5  = BigInt("2870177450012600261")

  /** (a * prime) mod 2^64 via 32-bit half products (all fit in HUGEINT). */
  private def mm(a: String, p: BigInt): String = {
    val plo = p % M32
    val phi = p / M32
    s"CAST(((CAST($a % $M32 AS HUGEINT) * $plo + " +
      s"((CAST($a // $M32 AS HUGEINT) * $plo + CAST($a % $M32 AS HUGEINT) * $phi) % $M32) * $M32)" +
      s" % $M64::HUGEINT) AS UBIGINT)"
  }

  /** rotl64(a, r) as multiply-mod + integer divide (bits are disjoint). */
  private def rotl(a: String, r: Int): String =
    s"CAST(((CAST($a AS HUGEINT) * ${1L << r}) % $M64::HUGEINT" +
      s" + CAST($a // ${1L << (64 - r)} AS HUGEINT)) AS UBIGINT)"

  /** (a + c) mod 2^64. */
  private def addc(a: String, c: BigInt): String =
    s"CAST(((CAST($a AS HUGEINT) + $c) % $M64::HUGEINT) AS UBIGINT)"

  private def xs(a: String, s: Int): String = s"xor($a, $a >> $s)"

  /** Ordered per-token steps; each expression references only EARLIER names
    * (that is what makes one-column-per-subquery nesting valid). */
  private def steps: Seq[(String, String)] = {
    val b = Seq.newBuilder[(String, String)]
    b += "len" -> "CAST(strlen(tok) AS UBIGINT)"
    for (i <- 1 to 8)
      b += s"b$i" ->
        s"CASE WHEN len >= $i THEN CAST(ascii(tok[$i:$i]) AS UBIGINT) ELSE CAST(0 AS UBIGINT) END"
    b += "w8" -> (1 to 8).map(i => s"b$i * ${1L << (8 * (i - 1))}::UBIGINT").mkString(" + ")
    b += "w4" -> (1 to 4).map(i => s"b$i * ${1L << (8 * (i - 1))}::UBIGINT").mkString(" + ")
    b += "h0" -> s"CAST(${P5 + 42} + len AS UBIGINT)"
    // first tail-byte position: none when the 8-byte round consumed all,
    // 5 after the 4-byte chunk, 1 otherwise
    b += "ts" -> "CASE WHEN len >= 8 THEN 99 WHEN len >= 4 THEN 5 ELSE 1 END"
    // 8-byte round (len = 8): h = rotl(h ^ round(0, w8), 27) * P1 + P4
    b += "k1a" -> mm("w8", P2)
    b += "k1b" -> rotl("k1a", 31)
    b += "k1"  -> mm("k1b", P1)
    b += "x8"  -> "xor(h0, k1)"
    b += "r8"  -> rotl("x8", 27)
    b += "h8p" -> mm("r8", P1)
    b += "h8"  -> addc("h8p", P4)
    b += "hA"  -> "CASE WHEN len = 8 THEN h8 ELSE h0 END"
    // 4-byte chunk (4 <= len < 8): h = rotl(h ^ w4*P1, 23) * P2 + P3
    b += "w4m" -> mm("w4", P1)
    b += "x4"  -> "xor(hA, w4m)"
    b += "r4"  -> rotl("x4", 23)
    b += "h4p" -> mm("r4", P2)
    b += "h4"  -> addc("h4p", P3)
    b += "hB"  -> "CASE WHEN len >= 4 AND len < 8 THEN h4 ELSE hA END"
    // up to three tail bytes: h = rotl(h ^ b*P5, 11) * P1
    var prev = "hB"
    for (k <- 0 to 2) {
      b += s"tb$k" -> ((s"CASE CAST(ts + $k AS INTEGER) " +
        (1 to 8).map(i => s"WHEN $i THEN b$i").mkString(" ")) +
        " ELSE CAST(0 AS UBIGINT) END")
      b += s"tm$k" -> mm(s"tb$k", P5)
      b += s"xb$k" -> s"xor($prev, tm$k)"
      b += s"rb$k" -> rotl(s"xb$k", 11)
      b += s"hb$k" -> mm(s"rb$k", P1)
      b += s"hC$k" -> s"CASE WHEN ts + $k <= len THEN hb$k ELSE $prev END"
      prev = s"hC$k"
    }
    // avalanche
    b += "a1" -> xs(prev, 33)
    b += "a2" -> mm("a1", P2)
    b += "a3" -> xs("a2", 29)
    b += "a4" -> mm("a3", P3)
    b += "h"  -> xs("a4", 32)
    b.result()
  }

  /** The full q_simhash oracle: per-token XXH64, 64 bit votes, signed fold. */
  val sql: String = {
    val inner =
      "SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok FROM documents"
    val hashed = steps.foldLeft(s"($inner)") { case (q, (name, expr)) =>
      s"(SELECT *, $expr AS $name FROM $q)"
    }
    s"""WITH bits AS (
       |  SELECT doc_id, bb.bit AS bit,
       |         sum(CASE WHEN (h >> CAST(bb.bit AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM (SELECT doc_id, h FROM $hashed) hashed,
       |       (SELECT unnest(range(64)) AS bit) bb
       |  GROUP BY doc_id, bb.bit
       |),
       |sig AS (
       |  SELECT doc_id,
       |         sum(CASE WHEN vote > 0 THEN CAST(1 AS UBIGINT) << CAST(bit AS INTEGER) ELSE CAST(0 AS UBIGINT) END) AS s
       |  FROM bits GROUP BY doc_id
       |)
       |SELECT doc_id,
       |       CAST(CASE WHEN s >= ${BigInt(2).pow(63)} THEN s - $M64::HUGEINT ELSE CAST(s AS HUGEINT) END AS BIGINT) AS simhash
       |FROM sig ORDER BY doc_id""".stripMargin
  }
}
