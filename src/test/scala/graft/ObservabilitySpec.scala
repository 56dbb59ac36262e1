package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pipeline observability: `observe()` attaches named metrics that are
 * computed DURING the action (accumulator-style, no second scan) — at
 * 100 TB this is how a curation run reports rows-in/rows-kept/bytes
 * without re-reading the corpus.
 */
class ObservabilitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("observe() reports curation metrics in one pass") {
    val in  = new Observation("in")
    val out = new Observation("out")
    val docs = Tables.documents(spark, dir)
      .observe(in, count(lit(1)).as("rows"), sum("n_chars").as("chars"))
      .where(col("n_chars") >= 100)
      .observe(out, count(lit(1)).as("rows"))
    val kept = docs.count()
    val total = Tables.documents(spark, dir).count()
    assert(in.get("rows") === total)
    assert(out.get("rows") === kept)
    assert(in.get("chars").asInstanceOf[Long] > 0L)
    assert(kept < total) // the filter actually dropped something
  }
}
