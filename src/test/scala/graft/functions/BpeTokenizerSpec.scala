package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeTokenizerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def enc(words: String*): Map[String, Seq[String]] =
    words.toDF("wd")
      .select(col("wd"), BpeTokenizer.encode(col("wd")).as("e"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  test("encode applies merges in rank order, chained through earlier outputs") {
    val e = enc("the", "thing", "and", "banana", "x", "er", "stone")
    assert(e("the") === Seq("the"))              // t+h → th, th+e → the
    assert(e("thing") === Seq("th", "ing"))      // th; i+n → in; in+g → ing
    assert(e("and") === Seq("and"))              // a+n → an; an+d → and
    // left-to-right non-overlapping: b [an] [an] a — the trailing 'a' has
    // no partner and no (an,an)/(an,a) merge exists
    assert(e("banana") === Seq("b", "an", "an", "a"))
    assert(e("x") === Seq("x"))                  // single char untouched
    assert(e("er") === Seq("er"))
    // s+t → st, o+n → on, then no (st,on)/(on,e) merge: st-on-e
    assert(e("stone") === Seq("st", "on", "e"))
  }

  test("merge count invariant: chars − tokens = number of merges applied") {
    val rows = Seq("the quick thing and another stone", "in on or er st")
      .toDF("text")
      .select(
        aggregate(transform(split(col("text"), " +"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("chars"),
        size(BpeTokenizer.encodeDoc(col("text"))).cast("long").as("toks"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) > r.getLong(1), "some merge must fire on this text")
    }
  }

  test("encodeDoc concatenates per-word encodings in order") {
    val got = Seq("the thing").toDF("text")
      .select(BpeTokenizer.encodeDoc(col("text")).as("e"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("the", "th", "ing"))
  }

  test("merge table obeys the operand invariant (class-load validate)") {
    // touching the object at all would have thrown if the invariant broke;
    // assert the property explicitly so a future table edit gets a named
    // failure here too
    val known = scala.collection.mutable.Set.empty[String]
    BpeTokenizer.Merges.foreach { case (a, b) =>
      assert(a.length == 1 || known(a), s"operand $a")
      assert(b.length == 1 || known(b), s"operand $b")
      known += (a + b)
    }
  }

  // ------------------------------------------------------------------
  // Codegen-expression parity (VERDICT r12 item 3): graft_bpe_encode /
  // graft_bpe_count are the production path; the HOF fold is the
  // definitional witness. Same precedent as cosine/winnow (SURVEY §4.2).
  // ------------------------------------------------------------------

  private val edgeTexts = Seq(
    "",                    // empty doc: split("", " +") = [""] → one "" token
    " ",                   // leading AND trailing empty word → ["", ""]
    " a b ",               // leading/trailing empties around real words
    "a  b",                // multi-space run is ONE separator
    "the quick thing and another stone",
    "banana and anthems standing in the ingot",
    "ttht thh er sst",     // left-to-right non-overlapping pass shapes
    "héllo wörld nappe😀x" // non-ASCII + surrogate pair pass-through
  )

  test("graft_bpe_encode bit-equals the definitional HOF fold") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .unionAll(edgeTexts.toDF("text"))
    val diff = docs.select(
        BpeTokenizer.encodeDoc(col("text")).as("fast"),
        BpeTokenizer.encodeDocHof(col("text")).as("slow"))
      .filter(not(col("fast") === col("slow")))
      .count()
    assert(diff === 0L, "codegen encode diverged from the HOF fold")
  }

  test("graft_bpe_count equals size(graft_bpe_encode) everywhere") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .unionAll(edgeTexts.toDF("text"))
    val diff = docs.select(
        BpeTokenizer.tokenCount(col("text")).as("n"),
        size(BpeTokenizer.encodeDoc(col("text"))).cast("long").as("sz"))
      .filter(col("n") =!= col("sz"))
      .count()
    assert(diff === 0L)
  }

  test("graft_bpe_encode edge semantics match Spark split exactly") {
    val e = edgeTexts.toDF("text")
      .select(col("text"), BpeTokenizer.encodeDoc(col("text")).as("enc"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(e("") === Seq(""))
    assert(e(" ") === Seq("", ""))
    assert(e(" a b ") === Seq("", "a", "b", ""))
    assert(e("a  b") === Seq("a", "b"))
    assert(e("the quick thing and another stone") ===
      Seq("the", "q", "u", "i", "c", "k", "th", "ing", "and",
        "an", "o", "the", "r", "st", "on", "e"))
  }

  test("both expressions are NULL-safe and codegen-visible") {
    val row = Seq((Option.empty[String], Some("the")))
      .toDF("a", "b")
      .select(
        BpeTokenizer.encodeDoc(col("a")).as("ea"),
        BpeTokenizer.tokenCount(col("a")).as("ca"),
        BpeTokenizer.encodeDoc(col("b")).as("eb"))
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
    assert(row.getSeq[String](2) === Seq("the"))
  }
}
