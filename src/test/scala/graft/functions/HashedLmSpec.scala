package graft.functions

import graft.{Tables, TestSpark}
import graft.expressions.RollingHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

class HashedLmSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rh(s: String): Long = RollingHash.hash(UTF8String.fromString(s))
  private val B = HashedLm.Buckets

  test("graft_hashed_score sums the right buckets for unigrams and bigrams") {
    // distinguishable weight tables: uni[b] = b, bi[b] = 100000 + b —
    // the expected score is then directly computable from the hashes
    val uni = Array.tabulate(B)(_.toDouble)
    val bi  = Array.tabulate(B)(b => 100000.0 + b)
    def expected(text: String): Double = {
      val w = text.split(" +", -1)
      val u = w.map(t => uni((rh(t) % B).toInt)).sum
      val g = w.sliding(2).filter(_.length == 2)
        .map(p => bi((rh(p(0) + " " + p(1)) % B).toInt)).sum
      u + (if (w.length >= 2) g else 0.0)
    }
    val cases = Seq("a b c", "solo", "", " lead", "trail ", "a  b", "x 😀 y")
    val out = cases.toDF("text")
      .select(HashedLm.score(col("text"), uni, bi).as("s"))
      .as[Double].collect()
    cases.zip(out).foreach { case (t, s) => assert(s === expected(t), s"text='$t'") }
    // empty bi table disables the bigram order
    val uniOnly = cases.toDF("text")
      .select(HashedLm.score(col("text"), uni, Array.empty[Double]).as("s"))
      .as[Double].collect()
    cases.zip(uniOnly).foreach { case (t, s) =>
      val w = t.split(" +", -1)
      assert(s === w.map(x => uni((rh(x) % B).toInt)).sum, s"uni-only text='$t'")
    }
    // NULL text → NULL score
    val n = Seq[Option[String]](None).toDF("text")
      .select(HashedLm.score(col("text"), uni, bi)).head()
    assert(n.isNullAt(0))
  }

  test("DSIR weights separate target-domain documents from the rest") {
    // the paper's defining property: documents FROM the target slice get
    // higher importance weights on average than documents outside it
    val docs = Tables.documents(spark, dir)
    val uniT = HashedLm.dsirTable(HashedLm.uniGrams(docs), col("lang") === "en")
    val biT  = HashedLm.dsirTable(HashedLm.biGrams(docs), col("lang") === "en")
    val means = docs
      .select(col("lang"), HashedLm.score(col("text"), uniT, biT).as("s"))
      .groupBy(when(col("lang") === "en", "target").otherwise("rest").as("side"))
      .agg(avg(col("s") ).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means("target") > means("rest"),
      s"mean DSIR weight target=${means("target")} rest=${means("rest")}")
  }

  test("hashed-LM cross-entropy: duplicates tie, rare text scores higher, terciles balance") {
    val docs = Tables.documents(spark, dir)
    val nlp  = HashedLm.nlogpTable(HashedLm.uniGrams(docs))
    def xent(text: String): Double = {
      val w = text.split(" +", -1)
      w.map(t => nlp((rh(t) % B).toInt)).sum / w.length
    }
    // a common-word doc is more probable under the corpus LM than a
    // never-seen-alphabet doc of the same length
    val common = docs.select(col("text")).as[String].head()
    assert(xent(common) < xent(common.split(" +", -1).map(_ => "zqxjkv9").mkString(" ")))
    // identical text ⇒ identical cross-entropy (the dedup-twin invariant)
    assert(xent(common) === xent(common))
    // CCNet head/middle/tail: rank-derived terciles stay within one doc
    // of each other per language (this is why the LABEL is spec-level,
    // not oracle-level: it rides on float ordering)
    val ce = docs.select(col("doc_id"), col("lang"),
        (HashedLm.score(col("text"), nlp, Array.empty[Double]) /
          size(split(col("text"), " +"))).as("ce"))
    val terciles = ce.withColumn("bucket",
        ntile(3).over(org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("ce"), col("doc_id"))))
      .groupBy("lang", "bucket").agg(count(lit(1)).as("n"))
      .groupBy("lang").agg((max("n") - min("n")).as("spread"))
      .as[(String, Long)].collect()
    terciles.foreach { case (lang, spread) => assert(spread <= 1L, s"lang=$lang") }
  }

  test("q_tempmix: rates are valid, sampling is deterministic, budget is approached") {
    val run  = graft.SparkEntry.queries("q_tempmix")
    val out1 = run(spark, dir).collect()
    val out2 = run(spark, dir).collect()
    assert(out1.toSeq === out2.toSeq) // recompute ⇒ identical subset
    val rates = out1.map(_.getDouble(2))
    assert(rates.forall(r => r >= 0.0 && r <= 1.0))
    val docs = out1.map(_.getLong(1)).sum
    val kept = out1.map(_.getLong(3)).sum
    assert(kept > 0 && kept < docs)
    // α=0.7 up-samples small sources: the smallest source's rate must be
    // at least the largest source's rate
    val bySize = out1.sortBy(_.getLong(1))
    assert(bySize.head.getDouble(2) >= bySize.last.getDouble(2))
    out1.foreach(r => assert(r.getLong(3) <= r.getLong(1)))
  }
}
