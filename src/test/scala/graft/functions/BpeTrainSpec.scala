package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Correctness gate for q_bpe_train (which has no SQL oracle by declared
 * contract — the iterated data-dependent argmax is SQL-inexpressible):
 * the distributed trainer must be bit-equal to the DEFINITIONAL
 * single-node Sennrich learn_bpe loop below, which shares NO code with
 * it (plain Scala maps over a collected corpus; no Spark expressions).
 */
class BpeTrainSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Definitional single-node BPE trainer: word-frequency dict, per-
    * iteration get_stats over ALL adjacent positions (overlaps count),
    * argmax with the (count desc, left asc, right asc) tie rule in
    * BINARY string order (UTF8String.compareTo — what Spark's `asc`
    * sorts by; Java String order differs on supplementary planes),
    * merge applied left-to-right non-overlapping. */
  private def referenceFit(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    val freq = scala.collection.mutable.Map.empty[List[String], Long]
    texts.foreach { t =>
      t.split(" +", -1).filter(_.nonEmpty).foreach { w =>
        val syms = w.codePoints().toArray.toList.map(Character.toChars(_).mkString)
        freq(syms) = freq.getOrElse(syms, 0L) + 1L
      }
    }
    def binLt(a: String, b: String): Boolean =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
    val out = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var k = 1
    var done = false
    while (k <= n && !done) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      freq.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => stats(p) = stats.getOrElse(p, 0L) + f)
      }
      if (stats.isEmpty) done = true
      else {
        val (bl, br) = stats.keys.reduceLeft { (p, q) =>
          val (cp, cq) = (stats(p), stats(q))
          if (cp > cq) p
          else if (cq > cp) q
          else if (binLt(p._1, q._1)) p
          else if (binLt(q._1, p._1)) q
          else if (binLt(p._2, q._2)) p
          else q
        }
        out += ((k, bl, br, stats((bl, br))))
        // left-to-right non-overlapping replacement of (bl, br) by bl+br
        val merged = freq.toSeq.map { case (syms, f) =>
          val b = scala.collection.mutable.ListBuffer.empty[String]
          syms.foreach { s =>
            if (b.nonEmpty && b.last == bl && s == br) { b.remove(b.length - 1); b += (bl + br) }
            else b += s
          }
          (b.toList, f)
        }
        freq.clear()
        merged.foreach { case (syms, f) => freq(syms) = freq.getOrElse(syms, 0L) + f }
        k += 1
      }
    }
    out.toList
  }

  test("distributed trainer equals the definitional single-node loop on the corpus") {
    val docs  = Tables.documents(spark, dir)
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got  = BpeTrain.fitMerges(docs, "text", 12)
    val want = referenceFit(texts, 12)
    assert(got === want)
  }

  test("reproduces the in-repo BpeTokenizer.Merges table from an engineered corpus") {
    // word frequencies chosen so the 12 argmaxes are exactly the fixed
    // table's merges in rank order: "th"×1200 gives (t,h) a lead over
    // the (h,e) that "the" co-counts (bare "the" alone would TIE them
    // and the (l,r) tie rule picks (h,e)); "and"/"ing" are kept small so
    // their char pairs never outrank the single-char merges, leaving
    // (an,d) then (in,g) as the tail once "an" and "in" exist.
    import spark.implicits._
    val corpus = Seq(
      "th" -> 1200, "the" -> 1100, "in" -> 1000, "er" -> 900, "an" -> 800,
      "re" -> 700, "on" -> 600, "st" -> 500, "en" -> 400, "or" -> 300,
      "and" -> 90, "ing" -> 80)
    val docs = corpus.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")
    val got = BpeTrain.fitMerges(docs, "text", 12).map { case (_, l, r, _) => (l, r) }
    assert(got === BpeTokenizer.Merges)
  }

  test("learned table satisfies the operand invariant (chars or earlier outputs)") {
    val docs = Tables.documents(spark, dir)
    val table = BpeTrain.fitMerges(docs, "text", 12)
    val known = scala.collection.mutable.Set.empty[String]
    table.foreach { case (_, a, b, _) =>
      assert(a.codePointCount(0, a.length) == 1 || known(a),
        s"operand '$a' is neither a code point nor an earlier merge output")
      assert(b.codePointCount(0, b.length) == 1 || known(b),
        s"operand '$b' is neither a code point nor an earlier merge output")
      known += (a + b)
    }
  }

  test("ties break deterministically: lowest left, then lowest right, binary order") {
    import spark.implicits._
    // every pair occurs exactly once: (a,b) from "ab", (b,a) from "ba",
    // (c,a) from "ca" — the argmax must be (a,b) by the (l, r) rule
    val docs = Seq("ab", "ba", "ca").toDF("text")
    val got = BpeTrain.fitMerges(docs, "text", 1)
    assert(got === Seq((1, "a", "b", 1L)))
  }

  test("training stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq("ab", "ab").toDF("text") // one merge exhausts the corpus
    val got = BpeTrain.fitMerges(docs, "text", 5)
    assert(got === Seq((1, "a", "b", 2L)))
  }
}
