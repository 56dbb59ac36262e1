package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("compiled graft_count_in matches the interpreted HOF marker counter") {
    val docs = Tables.documents(spark, dir)
    TextAnalysis.LangMarkers.foreach { case (_, markers) =>
      val parity = docs.select(
        TextAnalysis.markerHitsHof(col("text"), markers).as("hof"),
        call_function("graft_count_in", split(col("text"), " +"), typedLit(markers)).as("gen"))
        .filter(col("hof") =!= col("gen")).count()
      assert(parity === 0L)
    }
  }

  test("counts occurrences, not distinct hits") {
    val df = Seq("the a the the b").toDF("text")
    val n = df.select(
      call_function("graft_count_in", split(col("text"), " +"), typedLit(Seq("the", "a"))))
      .head().getLong(0)
    assert(n === 4L) // 3×the + 1×a
  }

  test("languageId picks the best marker profile with deterministic ties") {
    val df = Seq(
      ("d1", "the cat of the house"),  // en markers
      ("d2", "el la de y que"),        // es markers
      ("d3", "xyz qqq www")            // no markers => und
    ).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.languageId(col("text")).as("lang"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("d1") === "en")
    assert(out("d2") === "es")
    assert(out("d3") === "und")
  }

  test("token counts: whitespace vs BPE-ish subwords") {
    val df = Seq("hello world42 foo").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("t"),
      TextAnalysis.subwordCount(col("text")).as("s")).head()
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 4L) // hello | world | 42 | foo
  }

  test("classifier: exact-integer scores, bounded weights, ANSI-safe on short docs") {
    import spark.implicits._
    // weights live in [-ClfShift, ClfMod - 1 - ClfShift]
    val ws = Seq("the", "a", "zz9", "", "x y").toDF("t")
      .select(TextAnalysis.clfWeight(col("t")).as("w")).as[Long].collect()
    assert(ws.forall(w =>
      w >= -TextAnalysis.ClfShift && w <= TextAnalysis.ClfMod - 1 - TextAnalysis.ClfShift))
    // deterministic: same n-gram, same weight
    val twice = Seq("the", "the").toDF("t")
      .select(TextAnalysis.clfWeight(col("t")).as("w")).as[Long].collect()
    assert(twice(0) === twice(1))
    // 0- and 1-token docs must not trip ANSI element_at in the bigram
    // branch; a 2-token doc scores uni(a)+uni(b)+bi("a b") exactly
    val scores = Seq("", "solo", "a b").toDF("text")
      .select(TextAnalysis.clfScore(col("text")).as("s")).as[Long].collect()
    val w1 = Seq(("a")).toDF("t").select(TextAnalysis.clfWeight(col("t"))).as[Long].head()
    val w2 = Seq(("b")).toDF("t").select(TextAnalysis.clfWeight(col("t"))).as[Long].head()
    val wb = Seq(("a b")).toDF("t").select(TextAnalysis.clfWeight(col("t"))).as[Long].head()
    assert(scores(2) === w1 + w2 + wb)
  }

  test("compiled graft_clf_score matches the interpreted HOF fold (corpus + edges)") {
    // full sf0.001 corpus: every doc's compiled score equals the
    // definitional aggregate(transform(...)) fold
    val corpus = Tables.documents(spark, dir)
      .select(
        TextAnalysis.clfScore(col("text")).as("gen"),
        TextAnalysis.clfScoreHof(col("text")).as("hof"))
      .filter(col("gen") =!= col("hof")).count()
    assert(corpus === 0L)
    // edge literals: empty doc, leading/trailing/multi-space runs (empty
    // split tokens), 1-token doc, surrogate pair, NULL
    val edges = Seq("", " ", "  a", "a  ", "a   b  c", "solo", "a 😀 b")
    val edgeParity = edges.toDF("text")
      .select(
        TextAnalysis.clfScore(col("text")).as("gen"),
        TextAnalysis.clfScoreHof(col("text")).as("hof"))
      .filter(col("gen") =!= col("hof")).count()
    assert(edgeParity === 0L)
    val nullScore = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.clfScore(col("text"))).head()
    assert(nullScore.isNullAt(0))
  }

  test("rolling-hash fingerprint matches the Rabin-Karp recurrence") {
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(7L)((h, c) => (h * 31 + c) % 1000000007L)
    val inputs = Seq("", "a", "ab", "the quick brown fox", "repeat repeat repeat")
    val out = inputs.toDF("text")
      .select(TextAnalysis.rollingFingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    assert(out.toSeq === inputs.map(ref))
    // order-sensitive (unlike a bag-of-chars hash)
    assert(ref("ab") !== ref("ba"))
  }

  test("redactPii: exact spans replaced, near-misses and surrounding bytes survive, idempotent") {
    val cases = Seq(
      // (input, expected)
      ("mail x.y@z.io now",            "mail <EMAIL> now"),
      ("call +1-555-0042 today",       "call <PHONE> today"),
      ("a@b has no tld",               "a@b has no tld"),           // no dot-TLD → not an email
      ("+1-555-123 is short",          "+1-555-123 is short"),      // 3 digits → not the phone shape
      ("two a@b.co c@d.org hits",      "two <EMAIL> <EMAIL> hits"),
      ("no pii here at all",           "no pii here at all"))
    val out = cases.toDF("in", "want")
      .select(TextAnalysis.redactPii(col("in")).as("got"), col("want"),
        TextAnalysis.piiCount(col("in")).as("n"))
      .collect()
    out.zip(cases).foreach { case (r, (in, want)) =>
      assert(r.getString(0) === want, s"input: $in")
    }
    // counts agree with the number of replaced spans
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L, 0L, 0L, 2L, 0L))
    // idempotent: a second pass over redacted text changes nothing
    val twice = cases.toDF("in", "want")
      .select(TextAnalysis.redactPii(TextAnalysis.redactPii(col("in"))).as("got"), col("want"))
      .filter(col("got") =!= col("want")).count()
    assert(twice === 0L)
  }
}
