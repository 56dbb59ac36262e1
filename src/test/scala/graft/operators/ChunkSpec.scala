package graft.operators

import graft.TestSpark
import graft.queries.PipelineQueries
import org.scalatest.funsuite.AnyFunSuite

/**
 * Chunking invariants over the REAL expression pipeline (the one q_chunk
 * declares), across every token count 1..150 at window=64/stride=32:
 * total coverage (every token lands in a chunk), exact chunk sizing, and
 * the chunk-count formula — the guarantees a training-data pipeline
 * relies on when it packs contexts from chunks.
 */
class ChunkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("chunks cover every token, sizes and counts are exact (n = 1..150)") {
    import spark.implicits._
    val window = 64
    val stride = 32
    val docs = (1 to 150).map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = PipelineQueries.chunked(docs, "doc_id", "text", window, stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    (1 to 150).foreach { n =>
      val chunks = rows(n.toLong).sortBy(_._2)
      // count: one chunk per stride start below n
      assert(chunks.length === (n + stride - 1) / stride, s"n=$n")
      chunks.foreach { case (_, idx, tokens) =>
        val start = idx * stride
        assert(tokens === math.min(window.toLong, n - start), s"n=$n idx=$idx")
      }
      // coverage: union of [start, start+tokens) is exactly [0, n)
      val covered = chunks.flatMap { case (_, idx, tokens) =>
        (idx * stride) until (idx * stride + tokens) }.toSet
      assert(covered === (0L until n.toLong).toSet, s"n=$n")
    }
  }
}
