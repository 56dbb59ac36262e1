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
}
