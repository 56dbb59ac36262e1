package graft.expressions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Null/empty edge behavior of every extension-injected expression, driven
 * through the SQL surface (so both codegen and the null-handling wrappers
 * are on the path). At 100 TB the corpus WILL contain null and empty
 * documents/vectors; an expression that throws there kills the stage.
 */
class ExpressionEdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head().get(0)

  test("null inputs propagate null, not exceptions") {
    assert(one("graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))") == null)
    assert(one("graft_dot(CAST(NULL AS ARRAY<FLOAT>), CAST(NULL AS ARRAY<FLOAT>))") == null)
    assert(one("graft_minhash(CAST(NULL AS ARRAY<STRING>), 4)") == null)
    assert(one("graft_simhash(CAST(NULL AS ARRAY<STRING>))") == null)
    assert(one("graft_shingles(CAST(NULL AS STRING), 3)") == null)
    assert(one("graft_rollhash(CAST(NULL AS STRING))") == null)
    assert(one("graft_count_in(CAST(NULL AS ARRAY<STRING>), array('a'))") == null)
  }

  test("empty inputs return defined values") {
    // empty text → no shingles; minhash of nothing is the identity
    // signature (max sentinel), not a crash
    val shingles = one("graft_shingles('', 3)")
    assert(shingles.asInstanceOf[scala.collection.Seq[_]].isEmpty)
    val mh = one("graft_minhash(array(), 4)")
    assert(mh.asInstanceOf[scala.collection.Seq[_]].size === 4)
    val rh = one("graft_rollhash('')")
    assert(rh != null)
    assert(one("graft_count_in(array(), array('a'))") === 0L)
  }

  test("cosine of degenerate vectors is well-defined") {
    // zero vector has no direction: must be null or 0.0, never NaN/throw
    val z = one("graft_cosine(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
    assert(z == null || z == 0.0)
    val self = one("graft_cosine(array(CAST(3.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))")
    assert(math.abs(self.asInstanceOf[Double] - 1.0) < 1e-6)
  }

  test("type and arity misuse fails at analysis time with a usable message") {
    // wrong input type → AnalysisException (not an executor-side
    // ClassCastException mid-stage)
    val winnowTypeErr = intercept[Exception](one("graft_winnow(42)"))
    assert(winnowTypeErr.getMessage.contains("STRING"))
    // NULL bloom literal → analysis error (not a lazy executor NPE in
    // BloomFilter.readFrom)
    val bloomNullErr = intercept[Exception](
      one("graft_bloom_contains(CAST(1 AS BIGINT), CAST(NULL AS BINARY))"))
    assert(bloomNullErr.getMessage.toLowerCase.contains("null"))
    // wrong arity → usage message, not IndexOutOfBoundsException
    val zorderArity = intercept[Exception](one("graft_zorder(1)"))
    assert(zorderArity.getMessage.contains("graft_zorder"))
    val bloomArity = intercept[Exception](one("graft_bloom_contains(CAST(1 AS BIGINT))"))
    assert(bloomArity.getMessage.contains("graft_bloom_contains"))
    val cosineArity = intercept[Exception](one("graft_cosine(array(CAST(1.0 AS FLOAT)))"))
    assert(cosineArity.getMessage.contains("graft_cosine"))
    val dotArity = intercept[Exception](one("graft_dot(array(CAST(1.0 AS FLOAT)))"))
    assert(dotArity.getMessage.contains("graft_dot"))
    // non-literal word set → usage message, not a builder-side cast crash
    val countInErr = intercept[Exception](one("graft_count_in('a b')"))
    assert(countInErr.getMessage.contains("graft_count_in"))
  }

  test("expressions survive a whole-column pass over real data with injected nulls") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("t", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("text")))
    // aggregate over the expression OUTPUTS, not count(): a bare count lets
    // Catalyst prune the projection and the expressions never run
    // (bit_xor, not sum — hashes span the full 64-bit range and ANSI sum
    // overflows)
    val got = docs.selectExpr(
        "bit_xor(graft_simhash(split(t, ' +')))",
        "bit_xor(graft_rollhash(t))",
        "sum(size(graft_shingles(t, 3)))")
      .head()
    assert(!got.isNullAt(0) && !got.isNullAt(1) && !got.isNullAt(2))
  }

  test("hash-family expressions reject wrong input types at analysis time") {
    // pre-guard, graft_minhash over a non-string array read the Unsafe
    // layout as offset+length — silently wrong signatures, no error
    val mh = intercept[Exception](one("graft_minhash(array(1L, 2L), 4)"))
    assert(mh.getMessage.contains("ARRAY<STRING>"))
    val sh = intercept[Exception](one("graft_simhash('a b')"))
    assert(sh.getMessage.contains("ARRAY<STRING>"))
    val sg = intercept[Exception](one("graft_shingles(42, 3)"))
    assert(sg.getMessage.contains("STRING"))
    val rh = intercept[Exception](one("graft_rollhash(42)"))
    assert(rh.getMessage.contains("STRING"))
    val ci = intercept[Exception](one("graft_count_in(array(1L), array('a'))"))
    assert(ci.getMessage.contains("ARRAY<STRING>"))
  }
}
