package graft

import graft.expressions.{CosineSimilarity, CountInSet, DotProduct, MinHashSignature, RollingHashFingerprint, SimHash64, TopKSketch, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Session extensions registering graft's native codegen expressions as SQL
 * functions — the standard `spark.sql.extensions` injection path (no Spark
 * fork, works on any cluster that has the graft jar on the classpath):
 *
 *  - `graft_cosine(ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>) -> DOUBLE`
 *  - `graft_dot(ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>) -> DOUBLE`
 *
 * Activated via `GraftSession.configure` (`spark.sql.extensions=graft.GraftExtensions`).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Foldable-literal → Int with a usage error instead of the raw
    * NPE (NULL literal) / ClassCastException (string literal) the bare
    * `.eval().asInstanceOf[Number]` pattern produced. */
  private def intLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression, usage: String): Int =
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$usage — got ${if (other == null) "NULL" else other}")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(a, b) => CosineSimilarity(a, b)
          case _ => throw new IllegalArgumentException("graft_cosine(vec_a, vec_b)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(a, b) => DotProduct(a, b)
          case _ => throw new IllegalArgumentException("graft_dot(vec_a, vec_b)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(shingles) => MinHashSignature(shingles)
          case Seq(shingles, n) if n.foldable =>
            n.eval() match {
              case i: Number => MinHashSignature(shingles, i.intValue())
              case other => throw new IllegalArgumentException(
                s"graft_minhash: numHashes must be an integer literal, got $other")
            }
          case _ => throw new IllegalArgumentException(
            "graft_minhash(shingles[, numHashes]) — numHashes must be a literal")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(tokens) => SimHash64(tokens)
          case _ => throw new IllegalArgumentException("graft_simhash(tokens)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(text) => WordShingles(text)
          case Seq(text, n) if n.foldable =>
            WordShingles(text, intLit(n, "graft_shingles(text, n): n must be an integer literal"))
          case _ => throw new IllegalArgumentException(
            "graft_shingles(text[, n]) — n must be a literal")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKSketch].getName, "graft_topk"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(col) => TopKSketch(col)
          case Seq(col, cap) if cap.foldable =>
            TopKSketch(col, intLit(cap, "graft_topk(col, capacity): capacity must be an integer literal"))
          case _ => throw new IllegalArgumentException(
            "graft_topk(col[, capacity]) — capacity must be a literal")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_rollhash"),
      new ExpressionInfo(classOf[RollingHashFingerprint].getName, "graft_rollhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(text) => RollingHashFingerprint(text)
          case _ => throw new IllegalArgumentException("graft_rollhash(text)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[graft.expressions.ZOrderCode].getName, "graft_zorder"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(x, y) => graft.expressions.ZOrderCode(x, y)
          case _ => throw new IllegalArgumentException("graft_zorder(x, y)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[graft.expressions.WinnowFingerprints].getName, "graft_winnow"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(text) => graft.expressions.WinnowFingerprints(text)
          case Seq(text, k, w) if k.foldable && w.foldable =>
            graft.expressions.WinnowFingerprints(text,
              intLit(k, "graft_winnow(text, k, w): k must be an integer literal"),
              intLit(w, "graft_winnow(text, k, w): w must be an integer literal"))
          case _ => throw new IllegalArgumentException(
            "graft_winnow(text[, k, w]) — k and w must be literals")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[graft.expressions.BloomMightContain].getName, "graft_bloom_contains"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(key, bloom) => graft.expressions.BloomMightContain(key, bloom)
          case _ => throw new IllegalArgumentException("graft_bloom_contains(key, bloom)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_encode"),
      new ExpressionInfo(classOf[graft.expressions.BpeEncodeDoc].getName, "graft_bpe_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(text) => graft.expressions.BpeEncodeDoc(text)
          case _ => throw new IllegalArgumentException("graft_bpe_encode(text)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[graft.expressions.BpeTokenCount].getName, "graft_bpe_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(text) => graft.expressions.BpeTokenCount(text)
          case _ => throw new IllegalArgumentException("graft_bpe_count(text)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hashed_score"),
      new ExpressionInfo(classOf[graft.expressions.HashedNgramScore].getName, "graft_hashed_score"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def dblTable(e: org.apache.spark.sql.catalyst.expressions.Expression): IndexedSeq[Double] =
          e.eval() match {
            case a: ArrayData =>
              // ADVICE r13: toDoubleArray() on an array with a NULL element
              // throws a raw NPE/assertion — route it to the typed error.
              var i = 0
              while (i < a.numElements()) {
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"graft_hashed_score: weight table must be a non-null literal ARRAY<DOUBLE>, " +
                    s"but element $i is NULL")
                i += 1
              }
              a.toDoubleArray().toIndexedSeq
            case other => throw new IllegalArgumentException(
              s"graft_hashed_score: weight table must be a non-null literal ARRAY<DOUBLE>, got ${
                if (other == null) "NULL" else other}")
          }
        children match {
          case Seq(text, u, b) if u.foldable && b.foldable =>
            graft.expressions.HashedNgramScore(text, dblTable(u), dblTable(b))
          case _ => throw new IllegalArgumentException(
            "graft_hashed_score(text, uni_weights, bi_weights) — weight tables must be literal arrays")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_pairs"),
      new ExpressionInfo(classOf[graft.expressions.BpePairsUnder].getName, "graft_bpe_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // the learned merge table arrives as a foldable ARRAY<STRING> of
        // space-joined "left right" entries in rank order (symbols never
        // contain a space, so the join is lossless)
        def mergeTable(e: org.apache.spark.sql.catalyst.expressions.Expression): IndexedSeq[(String, String)] =
          e.eval() match {
            case a: ArrayData =>
              (0 until a.numElements()).map { i =>
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"graft_bpe_pairs: merge table element $i is NULL")
                val parts = a.getUTF8String(i).toString.split(' ')
                if (parts.length != 2 || parts.exists(_.isEmpty))
                  throw new IllegalArgumentException(
                    s"graft_bpe_pairs: merge entry $i must be 'left right', got '${a.getUTF8String(i)}'")
                (parts(0), parts(1))
              }
            case other => throw new IllegalArgumentException(
              s"graft_bpe_pairs: merge table must be a non-null literal ARRAY<STRING>, got ${
                if (other == null) "NULL" else other}")
          }
        children match {
          case Seq(word, t) if t.foldable =>
            graft.expressions.BpePairsUnder(word, mergeTable(t))
          case _ => throw new IllegalArgumentException(
            "graft_bpe_pairs(word, merges) — merge table must be a literal array")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_coarse_prune"),
      new ExpressionInfo(classOf[graft.expressions.CoarsePruneExpr].getName, "graft_coarse_prune"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // model artifacts arrive as foldable ARRAY<DOUBLE> literals (the
        // graft_hashed_score pattern): flattened g×dim coarse centers,
        // per-group ‖g‖², slack-inflated radii
        def dblLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): IndexedSeq[Double] =
          e.eval() match {
            case a: ArrayData =>
              var i = 0
              while (i < a.numElements()) {
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"graft_coarse_prune: $what must be a non-null literal ARRAY<DOUBLE>, " +
                    s"but element $i is NULL")
                i += 1
              }
              a.toDoubleArray().toIndexedSeq
            case other => throw new IllegalArgumentException(
              s"graft_coarse_prune: $what must be a non-null literal ARRAY<DOUBLE>, got ${
                if (other == null) "NULL" else other}")
          }
        children match {
          case Seq(vec, cs, gg, rs) if cs.foldable && gg.foldable && rs.foldable =>
            graft.expressions.CoarsePruneExpr(vec,
              dblLit(cs, "flat centers"), dblLit(gg, "group norms"), dblLit(rs, "radii"))
          case _ => throw new IllegalArgumentException(
            "graft_coarse_prune(vec, flat_centers, group_norms, radii) — model args must be literal arrays")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_centroid_argmin"),
      new ExpressionInfo(classOf[graft.expressions.CentroidArgminExpr].getName,
        "graft_centroid_argmin"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // same literal-model plumbing as graft_coarse_prune: flattened
        // c×dim centroids + per-centroid ‖c‖², null-element-checked
        def dblLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): IndexedSeq[Double] =
          e.eval() match {
            case a: ArrayData =>
              var i = 0
              while (i < a.numElements()) {
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"graft_centroid_argmin: $what must be a non-null literal ARRAY<DOUBLE>, " +
                    s"but element $i is NULL")
                i += 1
              }
              a.toDoubleArray().toIndexedSeq
            case other => throw new IllegalArgumentException(
              s"graft_centroid_argmin: $what must be a non-null literal ARRAY<DOUBLE>, got ${
                if (other == null) "NULL" else other}")
          }
        children match {
          case Seq(vec, cs, ccs) if cs.foldable && ccs.foldable =>
            graft.expressions.CentroidArgminExpr(vec,
              dblLit(cs, "flat centroids"), dblLit(ccs, "centroid norms"))
          case _ => throw new IllegalArgumentException(
            "graft_centroid_argmin(vec, flat_centroids, centroid_norms) — model args must be literal arrays")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_residual"),
      new ExpressionInfo(classOf[graft.expressions.ResidualExpr].getName,
        "graft_residual"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // same literal-model plumbing as graft_centroid_argmin
        def dblLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): IndexedSeq[Double] =
          e.eval() match {
            case a: ArrayData =>
              var i = 0
              while (i < a.numElements()) {
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"graft_residual: $what must be a non-null literal ARRAY<DOUBLE>, " +
                    s"but element $i is NULL")
                i += 1
              }
              a.toDoubleArray().toIndexedSeq
            case other => throw new IllegalArgumentException(
              s"graft_residual: $what must be a non-null literal ARRAY<DOUBLE>, got ${
                if (other == null) "NULL" else other}")
          }
        children match {
          case Seq(vec, cid, cs, d) if cs.foldable && d.foldable =>
            val dim = d.eval() match {
              case i: Int => i
              case other => throw new IllegalArgumentException(
                s"graft_residual: dim must be a literal INT, got ${
                  if (other == null) "NULL" else other}")
            }
            graft.expressions.ResidualExpr(vec, cid, dblLit(cs, "flat centroids"), dim)
          case _ => throw new IllegalArgumentException(
            "graft_residual(vec, cid, flat_centroids, dim) — model args must be literals")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[graft.expressions.PqEncodeExpr].getName,
        "graft_pq_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def dblLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): IndexedSeq[Double] =
          e.eval() match {
            case a: ArrayData =>
              var i = 0
              while (i < a.numElements()) {
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"graft_pq_encode: $what must be a non-null literal ARRAY<DOUBLE>, " +
                    s"but element $i is NULL")
                i += 1
              }
              a.toDoubleArray().toIndexedSeq
            case other => throw new IllegalArgumentException(
              s"graft_pq_encode: $what must be a non-null literal ARRAY<DOUBLE>, got ${
                if (other == null) "NULL" else other}")
          }
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int =
          e.eval() match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"graft_pq_encode: $what must be a literal INT, got ${
                if (other == null) "NULL" else other}")
          }
        children match {
          case Seq(vec, cb, m, k) if cb.foldable && m.foldable && k.foldable =>
            graft.expressions.PqEncodeExpr(vec,
              dblLit(cb, "flat codebooks"), intLit(m, "m"), intLit(k, "ksub"))
          case _ => throw new IllegalArgumentException(
            "graft_pq_encode(vec, flat_codebooks, m, ksub) — model args must be literals")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[graft.expressions.AdcSumExpr].getName, "graft_adc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def dblLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): IndexedSeq[Double] =
          e.eval() match {
            case a: ArrayData =>
              var i = 0
              while (i < a.numElements()) {
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"graft_adc: $what must be a non-null literal ARRAY<DOUBLE>, " +
                    s"but element $i is NULL")
                i += 1
              }
              a.toDoubleArray().toIndexedSeq
            case other => throw new IllegalArgumentException(
              s"graft_adc: $what must be a non-null literal ARRAY<DOUBLE>, got ${
                if (other == null) "NULL" else other}")
          }
        children match {
          case Seq(codes, tab, k) if tab.foldable && k.foldable =>
            val ks = k.eval() match {
              case i: Int => i
              case other => throw new IllegalArgumentException(
                s"graft_adc: ksub must be a literal INT, got ${
                  if (other == null) "NULL" else other}")
            }
            graft.expressions.AdcSumExpr(codes, dblLit(tab, "flat adc table"), ks)
          case _ => throw new IllegalArgumentException(
            "graft_adc(codes, flat_table, ksub) — table args must be literals")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_adc_table"),
      new ExpressionInfo(classOf[graft.expressions.PqTableExpr].getName,
        "graft_adc_table"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // same literal-model plumbing as graft_pq_encode
        def dblLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): IndexedSeq[Double] =
          e.eval() match {
            case a: ArrayData =>
              var i = 0
              while (i < a.numElements()) {
                if (a.isNullAt(i)) throw new IllegalArgumentException(
                  s"graft_adc_table: $what must be a non-null literal ARRAY<DOUBLE>, " +
                    s"but element $i is NULL")
                i += 1
              }
              a.toDoubleArray().toIndexedSeq
            case other => throw new IllegalArgumentException(
              s"graft_adc_table: $what must be a non-null literal ARRAY<DOUBLE>, got ${
                if (other == null) "NULL" else other}")
          }
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            what: String): Int =
          e.eval() match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"graft_adc_table: $what must be a literal INT, got ${
                if (other == null) "NULL" else other}")
          }
        children match {
          case Seq(vec, cb, m, k) if cb.foldable && m.foldable && k.foldable =>
            graft.expressions.PqTableExpr(vec,
              dblLit(cb, "flat codebooks"), intLit(m, "m"), intLit(k, "ksub"))
          case _ => throw new IllegalArgumentException(
            "graft_adc_table(vec, flat_codebooks, m, ksub) — model args must be literals")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_adc_dyn"),
      new ExpressionInfo(classOf[graft.expressions.AdcDynExpr].getName,
        "graft_adc_dyn"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        children match {
          case Seq(codes, tab, k) if k.foldable =>
            val ks = k.eval() match {
              case i: Int => i
              case other => throw new IllegalArgumentException(
                s"graft_adc_dyn: ksub must be a literal INT, got ${
                  if (other == null) "NULL" else other}")
            }
            graft.expressions.AdcDynExpr(codes, tab, ks)
          case _ => throw new IllegalArgumentException(
            "graft_adc_dyn(codes, tab, ksub) — ksub must be a literal INT")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_clf_score"),
      new ExpressionInfo(classOf[graft.expressions.ClfScoreExpr].getName, "graft_clf_score"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          case Seq(text) => graft.expressions.ClfScoreExpr(text)
          case _ => throw new IllegalArgumentException("graft_clf_score(text)")
        }))
    ext.injectFunction((
      new FunctionIdentifier("graft_count_in"),
      new ExpressionInfo(classOf[CountInSet].getName, "graft_count_in"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        children match {
          // second arg: a foldable array of string literals (the word set)
          case Seq(text, set) if set.foldable && set.eval() != null =>
            val words = set.eval().asInstanceOf[ArrayData]
              .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
            CountInSet(text, words)
          case _ => throw new IllegalArgumentException(
            "graft_count_in(text, array('w1', ...)) — the word set must be a non-null literal array")
        }))
  }
}
