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
}
