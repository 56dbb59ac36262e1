package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sim1(a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(Similarity.cosineSimilarity(col("a"), col("b")).as("s"))
      .head().getDouble(0)

  test("cosine of identical vectors is 1") {
    assert(math.abs(sim1(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    assert(math.abs(sim1(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
  }

  test("cosine matches hand computation") {
    // a=(1,2), b=(3,4): dot=11, |a|=sqrt5, |b|=5 => 11/(5*sqrt5)
    val want = 11.0 / (5.0 * math.sqrt(5.0))
    assert(math.abs(sim1(Seq(1f, 2f), Seq(3f, 4f)) - want) < 1e-12)
  }

  test("codegen graft_cosine equals the interpreted HOF reference") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (Seq(0.5f, -2f, 7f), Seq(4f, 5f, 6f)),
      (Seq(-1f, -1f, -1f), Seq(4f, 5f, 6f))
    ).toDF("a", "p")
    val rows = df.select(
      Similarity.cosineSimilarityHof(col("a"), col("p")).as("hof"),
      Similarity.cosineSimilarity(col("a"), col("p")).as("codegen"),
      Similarity.dotProductHof(col("a"), col("p")).as("dothof"),
      Similarity.dotProduct(col("a"), col("p")).as("dotgen")
    ).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12)
    }
  }

  test("zero vector yields NULL (undefined cosine, ANSI-safe)") {
    val r = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
      .select(Similarity.cosineSimilarity(col("a"), col("b")).as("s"))
      .head()
    assert(r.isNullAt(0))
  }

  test("squaredL2Distance matches hand computation") {
    val d = Seq((Seq(1f, 2f), Seq(4f, 6f))).toDF("a", "b")
      .select(Similarity.squaredL2Distance(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 25.0) < 1e-12)
  }
}
