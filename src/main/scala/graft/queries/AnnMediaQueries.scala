package graft.queries

import graft.Tables
import graft.operators.{Ann, Multimodal}
import org.apache.spark.sql.functions._

/**
 * ANN similarity search + multimodal plumbing queries. The LSH paths
 * (q_ann, q_knn_lsh) are FULLY oracle-checked: the hyperplanes are
 * data-independent (deterministic seed), so [[bucketSql]] inlines them as
 * literal arrays and the DuckDB oracle replays bucket assignment +
 * multiprobe + rerank bit-for-bit (recall vs brute force is additionally
 * asserted in AnnSpec). The IVF path is oracle-checked the same way, one
 * step later: the coarse quantizer is data-DEPENDENT but deterministic
 * (sample-bounded seedless Lloyd — [[graft.operators.Ann.ivfFit]]), so the
 * q_ivf run records its fitted centroids and the oracle SQL — assembled by
 * Verify AFTER the queries ran — inlines them as literals and replays
 * nearest-centroid assignment, nprobe list selection, and the exact rerank
 * bit-for-bit (the fit itself is pinned by AnnSpec: recall + determinism).
 * The graph path (q_hnsw) emits a self-certifying row instead — beam
 * search over a shard-local graph is not SQL-replayable, so the query
 * CHECKS its answer against the in-plan exact scan (recall floor + exact
 * per-id cosine agreement) and the oracle pins the certificate. The media
 * queries oracle-check the binary-column plumbing INCLUDING the
 * partition-wise stub decoder (its deterministic outputs are re-derivable
 * in SQL).
 */
object AnnMediaQueries {

  /** The q_ivf run's fitted coarse quantizer, recorded for the oracle
    * builder. Safe as a plain volatile: Verify runs queries sequentially
    * and dumps `SparkEntry.oracleSql` afterwards, always against ONE sf
    * dir, so the last recorded fit is the one the oracle must replay. */
  @volatile private var ivfCentroids: Option[Array[Array[Double]]] = None

  /** q_ivf_idx's recorded fit (same mechanism; separate slot so a subset
    * Verify run of either query materializes its own oracle). */
  @volatile private var ivfIdxCentroids: Option[Array[Array[Double]]] = None

  /** q_semdedup's recorded fit (same mechanism). */
  @volatile private var semCentroids: Option[Array[Array[Double]]] = None

  /** q_pq's recorded codebooks + probe ADC table (same mechanism). */
  @volatile private var pqModel: Option[(Array[Array[Array[Double]]], Array[Array[Double]])] = None

  /** q_pq_idx's recorded fit (separate slot, like ivfIdxCentroids). */
  @volatile private var pqIdxModel: Option[(Array[Array[Array[Double]]], Array[Array[Double]])] = None

  /** q_ivfpq's recorded fits: coarse centroids + codebooks + probe table. */
  @volatile private var ivfpqModel: Option[(Array[Array[Double]], Array[Array[Array[Double]]], Array[Array[Double]])] = None

  /** q_ivfpq_idx's recorded fits (separate slot, like ivfIdxCentroids). */
  @volatile private var ivfpqIdxModel: Option[(Array[Array[Double]], Array[Array[Array[Double]]], Array[Array[Double]])] = None

  /** q_ivfpq_res's recorded fits: coarse centroids + RESIDUAL codebooks +
    * the per-probed-cell ADC tables (nprobe tables, one per visited
    * list — Jégou §IV), in nearest-cell order. */
  @volatile private var ivfpqResModel: Option[(Array[Array[Double]], Array[Array[Array[Double]]], Seq[(Int, Array[Array[Double]])])] = None

  /** q_ivfpq_res_idx's recorded fits (separate slot, same shape). */
  @volatile private var ivfpqResIdxModel: Option[(Array[Array[Double]], Array[Array[Array[Double]]], Seq[(Int, Array[Array[Double]])])] = None

  /** q_knn_pq's recorded codebooks (the batch path needs no probe table
    * literals — the oracle rebuilds every probe's table from the
    * codebook literals with the same fragments the encode replay uses). */
  @volatile private var pqKnnModel: Option[Array[Array[Array[Double]]]] = None

  /** q_semdedup's parameters, defined ONCE and interpolated into both the
    * engine call and the generated oracle SQL (ADVICE r11: a tau literal
    * hardcoded in the SQL next to a separate tau literal in the call site
    * turns any single-sided edit into a silently different oracle). Tau
    * is carried as the string both sides print so the SQL literal is the
    * exact double the engine compares against. */
  private val SemTau: Double = 0.45
  private val SemC: Int      = 16

  /** q_pq's parameters (same single-definition discipline as SemTau/SemC):
    * 8 subspaces × 16 codes over the 64-dim corpus → 8 codes/vector, and a
    * 50-row ADC shortlist in front of the exact top-10 rerank. */
  private val PqM: Int         = 8
  private val PqKsub: Int      = 16
  private val PqShortlist: Int = 50

  /** q_ivfpq's coarse-level fan-out (the q_ivf nprobe). */
  private val IvfPqNprobe: Int = 4

  /** DuckDB replay of [[graft.operators.Ann.ivfTopK]] from literal
    * centroids — mirrors each engine-side computation at matching
    * float-op order so the hash check is bit-for-bit:
    *  - assignment `d_j = −2⟨v,c_j⟩ + ‖c_j‖²` with ‖c_j‖² inlined as the
    *    same Scala-computed literal Spark uses (`Ann.assignCentroid`),
    *    ties to the lowest cid (Spark: first index of the array min);
    *  - nprobe ranking by the DRIVER-side formula `Σ(c_ji−p_i)²`
    *    accumulated left-to-right (`Ann.ivfTopK`'s Scala fold);
    *  - exact cosine rerank, identical to the q_ann oracle.
    */
  private def ivfOracleSql: Option[String] = ivfCentroids.map(ivfReplaySql)

  private def ivfIdxOracleSql: Option[String] = ivfIdxCentroids.map(ivfReplaySql)

  /** DuckDB replay of [[graft.operators.Ann.semDedupStats]] from literal
    * centroids: the same asg CTE as the IVF replay (bit-identical
    * distance fold, ties → lowest cid), then the cluster-LOCAL pair join
    * with the raw `list_cosine_similarity ≥ τ` threshold (the q_embdup
    * contract: both engines' cosine is the identical left-to-right double
    * fold, so the ≥ decision agrees bit-for-bit), keep-first drops, and
    * the per-cluster summary. The oracle does the SAME cluster-local work
    * as the engine — linear × cluster size, not all-pairs. */
  private def semOracleSql: Option[String] = semCentroids.map { cs =>
    val values = cs.zipWithIndex.map { case (cv, cid) =>
      val cc = cv.map(x => x * x).sum
      s"($cid, CAST(${planeLit(cv.toSeq)} AS DOUBLE[]), ${cc.toString})"
    }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c(cid, cv, cc) AS (VALUES
       |  $values),
       |asg AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY -2 * list_dot_product(e.v, c.cv) + c.cc, c.cid) AS rn
       |    FROM e CROSS JOIN c)
       |  WHERE rn = 1),
       |drp AS (
       |  SELECT DISTINCT a.cid, b.vec_id AS vb
       |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.v, b.v) >= ${SemTau.toString}),
       |per AS (SELECT cid, count(*) AS n_vecs FROM asg GROUP BY cid),
       |dc AS (SELECT cid, count(*) AS n_dropped FROM drp GROUP BY cid)
       |SELECT per.cid, CAST(per.n_vecs AS BIGINT) AS n_vecs,
       |       CAST(coalesce(dc.n_dropped, 0) AS BIGINT) AS n_dropped
       |FROM per LEFT JOIN dc USING (cid) ORDER BY per.cid""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.Ann.pqEncode]] + [[Ann.pqTopK]]
    * from literal codebooks + the literal probe ADC table: per-subspace
    * distances as the same left-to-right fold over the sliced subvector
    * (list_aggregate 'sum' ≡ Spark's 0.0-seeded left fold — the seed add
    * is exact on the non-negative squared terms), argmin ties to the
    * LOWEST code on both engines (list_position / array_position = first
    * match), the m-term ADC lookup sum in subspace order, the unrounded-
    * adc shortlist cut, and the exact-cosine rerank — so the whole
    * compressed-domain path downstream of the fit is hash-checked
    * bit-for-bit (the fit itself: AnnSpec determinism + recall). */
  private def pqOracleSql: Option[String] = pqModel.map(pqReplaySql)

  /** q_pq_idx replays to the SAME SQL (the persisted path must reproduce
    * q_pq's rows — parquet round-trips and the point-lookup rerank are
    * plan choices, not semantics), from its own run's recorded fit. */
  private def pqIdxOracleSql: Option[String] = pqIdxModel.map(pqReplaySql)

  /** The per-subspace distance-array column list (`ds_0 … ds_{m-1}`) with
    * the codebooks inlined as literals, and the codes-array expression
    * (first-min argmin per subspace). Shared by the q_pq/q_pq_idx replay
    * and the q_ivfpq replay so the encode SQL cannot drift between them. */
  private def pqEncFragments(books: Array[Array[Array[Double]]]): (String, String) = {
    val m    = books.length
    val dsub = books.head.head.length
    val dsCols = (0 until m).map { s =>
      val bookLit = books(s).map(cb => planeLit(cb.toSeq)).mkString("[", ",\n      ", "]")
      s"""list_transform(CAST($bookLit AS DOUBLE[][]), cb ->
         |    list_aggregate(list_transform(range(1, ${dsub + 1}),
         |      i -> (v[${s * dsub} + i] - cb[i]) * (v[${s * dsub} + i] - cb[i])),
         |      'sum')) AS ds_$s""".stripMargin
    }.mkString(",\n  ")
    val codes = (0 until m)
      .map(s => s"CAST(list_position(ds_$s, list_aggregate(ds_$s, 'min')) - 1 AS INT)")
      .mkString("[", ", ", "]")
    (dsCols, codes)
  }

  /** The ADC lookup-sum expression over a `codes` column, table inlined. */
  private def pqAdcSql(tab: Array[Array[Double]]): String = {
    val tabLit = tab.map(r => planeLit(r.toSeq)).mkString("[", ",\n    ", "]")
    s"""list_aggregate(list_transform(range(1, ${tab.length + 1}),
       |    s -> (CAST($tabLit AS DOUBLE[][]))[s][codes[s] + 1]), 'sum')""".stripMargin
  }

  /** The shared PQ tail: encode → codes → ADC → unrounded-adc shortlist →
    * exact-cosine rerank, starting from a CTE named `f(vec_id, v)` (the
    * candidate set — the whole corpus for q_pq, the nprobe cells for
    * q_ivfpq). Expects an `e(vec_id, v)` CTE in scope for the probe. */
  private def pqTailSql(books: Array[Array[Array[Double]]],
      tab: Array[Array[Double]]): String = {
    val (dsCols, codes) = pqEncFragments(books)
    s"""enc AS (SELECT vec_id, v,
       |  $dsCols
       |  FROM f),
       |cod AS (SELECT vec_id, v, $codes AS codes FROM enc),
       |a AS (SELECT vec_id, v,
       |  ${pqAdcSql(tab)} AS adc
       |  FROM cod),
       |sl AS (SELECT vec_id, adc, v FROM a ORDER BY adc, vec_id LIMIT $PqShortlist),
       |p AS (SELECT v AS pv FROM e WHERE vec_id = 0)
       |SELECT sl.vec_id AS vec_id, round(sl.adc, 4) AS adc,
       |       round(list_dot_product(sl.v, p.pv)
       |         / nullif(sqrt(list_dot_product(sl.v, sl.v))
       |                  * sqrt(list_dot_product(p.pv, p.pv)), 0), 4) AS sim
       |FROM sl, p ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  }

  private def pqReplaySql(model: (Array[Array[Array[Double]]], Array[Array[Double]])): String = {
    val (books, tab) = model
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |f AS (SELECT vec_id, v FROM e),
       |${pqTailSql(books, tab)}""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.Ann.ivfPqTopK]] — the IVFADC
    * composition: the q_ivf replay's literal-centroid assignment + nprobe
    * cell cut feeding the q_pq replay's encode/ADC/shortlist/rerank tail.
    * Both models ride as literals recorded from the run's fits. */
  private def ivfpqOracleSql: Option[String] = ivfpqModel.map(ivfpqReplaySql)

  /** q_ivfpq_idx replays to the SAME SQL as q_ivfpq (the persisted
    * cid-partitioned path must reproduce the compute path's rows —
    * partition pruning and the pushed-In rerank are plan choices, not
    * semantics), from its own run's recorded fits. */
  private def ivfpqIdxOracleSql: Option[String] = ivfpqIdxModel.map(ivfpqReplaySql)

  /** The literal coarse-model preamble shared by every IVFADC replay:
    * e (non-null vectors), c (centroid literals + norms), asg
    * (bit-identical assignment fold, ties → lowest cid), pp (the probe),
    * np (the nprobe cell cut by the driver-side squared-L2 fold). */
  private def ivfpqPreambleSql(cs: Array[Array[Double]]): String = {
    val values = cs.zipWithIndex.map { case (cv, cid) =>
      val cc = cv.map(x => x * x).sum
      s"($cid, CAST(${planeLit(cv.toSeq)} AS DOUBLE[]), ${cc.toString})"
    }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |c(cid, cv, cc) AS (VALUES
       |  $values),
       |asg AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY -2 * list_dot_product(e.v, c.cv) + c.cc, c.cid) AS rn
       |    FROM e CROSS JOIN c)
       |  WHERE rn = 1),
       |pp AS (SELECT v AS pv FROM e WHERE vec_id = 0),
       |np AS (SELECT c.cid FROM c, pp
       |       ORDER BY list_aggregate(list_transform(range(1, 1 + len(c.cv)),
       |                  i -> (c.cv[i] - pp.pv[i]) * (c.cv[i] - pp.pv[i])), 'sum'), c.cid
       |       LIMIT $IvfPqNprobe)""".stripMargin
  }

  private def ivfpqReplaySql(
      model: (Array[Array[Double]], Array[Array[Array[Double]]], Array[Array[Double]])): String = {
    val (cs, books, tab) = model
    s"""${ivfpqPreambleSql(cs)},
       |f AS (SELECT vec_id, v FROM asg WHERE cid IN (SELECT cid FROM np)),
       |${pqTailSql(books, tab)}""".stripMargin
  }

  private def ivfpqResOracleSql: Option[String] = ivfpqResModel.map(ivfpqResReplaySql)

  /** q_ivfpq_res_idx replays to the SAME SQL as q_ivfpq_res (the
    * persisted-vs-compute discipline again), from its own recorded fits. */
  private def ivfpqResIdxOracleSql: Option[String] = ivfpqResIdxModel.map(ivfpqResReplaySql)

  /** DuckDB replay of [[graft.operators.Ann.ivfPqResTopK]] — residual
    * IVFADC (Jégou §IV's full refinement): the shared preamble's cell
    * cut, then literal centroid SUBTRACTION (`v[i] − cv[i]` elementwise,
    * the [[graft.expressions.ResidualExpr]] arithmetic — NULL elements
    * propagate identically), the shared encode fragments over the
    * residual, a per-cell CASE of literal ADC tables (each recorded from
    * the engine's own probe-residual computation), the unrounded-adc
    * shortlist, and the exact-cosine rerank on the RAW vectors. */
  private def ivfpqResReplaySql(
      model: (Array[Array[Double]], Array[Array[Array[Double]]], Seq[(Int, Array[Array[Double]])])): String = {
    val (cs, books, tabs) = model
    val dim             = books.length * books.head.head.length
    val (dsCols, codes) = pqEncFragments(books)
    val adcCase = tabs.map { case (cid, t) =>
      s"WHEN cid = $cid THEN ${pqAdcSql(t)}"
    }.mkString("CASE ", "\n       ", "\n       END")
    s"""${ivfpqPreambleSql(cs)},
       |f AS (SELECT a.vec_id,
       |             list_transform(range(1, ${dim + 1}), i -> a.v[i] - c.cv[i]) AS v,
       |             a.v AS rv, a.cid AS cid
       |      FROM asg a JOIN c ON a.cid = c.cid
       |      WHERE a.cid IN (SELECT cid FROM np)),
       |enc AS (SELECT vec_id, rv, cid,
       |  $dsCols
       |  FROM f),
       |cod AS (SELECT vec_id, rv, cid, $codes AS codes FROM enc),
       |adcs AS (SELECT vec_id, rv,
       |  $adcCase AS adc
       |  FROM cod),
       |sl AS (SELECT vec_id, adc, rv FROM adcs WHERE adc IS NOT NULL
       |       ORDER BY adc, vec_id LIMIT $PqShortlist),
       |p AS (SELECT v AS pv FROM e WHERE vec_id = 0)
       |SELECT sl.vec_id AS vec_id, round(sl.adc, 4) AS adc,
       |       round(list_dot_product(sl.rv, p.pv)
       |         / nullif(sqrt(list_dot_product(sl.rv, sl.rv))
       |                  * sqrt(list_dot_product(p.pv, p.pv)), 0), 4) AS sim
       |FROM sl, p ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  }

  private def pqKnnOracleSql: Option[String] = pqKnnModel.map { books =>
    val ksub            = books.head.length
    val (dsCols, codes) = pqEncFragments(books)
    // tab(s) for a probe IS the encode's per-subspace distance array
    // ds_s computed on the probe vector, so the probe tables replay with
    // the SAME fragments as the corpus encode — m indexed lookups, the
    // explicit + chain matching the compiled 0.0-seeded left fold
    // (0.0 + t0 is exact on doubles).
    val adcChain = (0 until books.length)
      .map(s => s"pt.ds_$s[c.codes[${s + 1}] + 1]")
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |f AS (SELECT vec_id, v FROM e),
       |enc AS (SELECT vec_id,
       |  $dsCols
       |  FROM f),
       |cod AS (SELECT vec_id, $codes AS codes FROM enc),
       |pt AS (SELECT probe_id,
       |  $dsCols
       |  FROM (SELECT vec_id AS probe_id, v FROM e WHERE vec_id < 10)),
       |cand AS (SELECT pt.probe_id, c.vec_id,
       |                $adcChain AS adc
       |         FROM cod c CROSS JOIN pt WHERE c.vec_id <> pt.probe_id),
       |sl AS (SELECT probe_id, vec_id FROM (
       |         SELECT probe_id, vec_id, adc,
       |                row_number() OVER (PARTITION BY probe_id
       |                  ORDER BY adc, vec_id) AS arn
       |         FROM cand)
       |       WHERE arn <= $PqShortlist AND adc IS NOT NULL),
       |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10),
       |sims AS (SELECT sl.probe_id, sl.vec_id,
       |                round(list_dot_product(e.v, p.pv)
       |                  / nullif(sqrt(list_dot_product(e.v, e.v))
       |                           * sqrt(list_dot_product(p.pv, p.pv)), 0), 4) AS sim
       |         FROM sl JOIN e ON e.vec_id = sl.vec_id
       |                 JOIN p ON p.probe_id = sl.probe_id),
       |r AS (SELECT probe_id, vec_id, sim,
       |             row_number() OVER (PARTITION BY probe_id
       |               ORDER BY sim DESC, vec_id) AS rn
       |      FROM sims)
       |SELECT probe_id, vec_id, sim, rn FROM r WHERE rn <= 5
       |ORDER BY probe_id, rn""".stripMargin
  }

  private def ivfReplaySql(cs: Array[Array[Double]]): String = {
    val values = cs.zipWithIndex.map { case (cv, cid) =>
      val cc = cv.map(x => x * x).sum
      s"($cid, CAST(${planeLit(cv.toSeq)} AS DOUBLE[]), ${cc.toString})"
    }.mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c(cid, cv, cc) AS (VALUES
       |  $values),
       |asg AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY -2 * list_dot_product(e.v, c.cv) + c.cc, c.cid) AS rn
       |    FROM e CROSS JOIN c)
       |  WHERE rn = 1),
       |p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
       |np AS (SELECT c.cid FROM c, p
       |       ORDER BY list_aggregate(list_transform(range(1, 1 + len(c.cv)),
       |                  i -> (c.cv[i] - p.pv[i]) * (c.cv[i] - p.pv[i])), 'sum'), c.cid
       |       LIMIT 4),
       |cand AS (SELECT a.vec_id,
       |                round(list_dot_product(a.v, p.pv)
       |                  / nullif(sqrt(list_dot_product(a.v, a.v))
       |                           * sqrt(list_dot_product(p.pv, p.pv)), 0), 4) AS sim
       |         FROM asg a, p WHERE a.cid IN (SELECT cid FROM np))
       |SELECT vec_id, sim FROM cand ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Full-precision double literal (Double.toString round-trips exactly, so
    * DuckDB parses back the bit-identical plane coefficient). */
  private def planeLit(p: Seq[Double]): String =
    p.map(_.toString).mkString("[", ", ", "]")

  /** The LSH bucket id as DuckDB SQL: the hyperplanes are DATA-INDEPENDENT
    * (deterministic seed), so the oracle can inline them as literal arrays
    * and replicate bucket assignment bit-for-bit — which upgrades the LSH
    * ANN queries from rows-only to full hash-checked. Both engines promote
    * to double and accumulate the dot product left-to-right (Similarity's
    * contract), so the `>= 0` sign test agrees. */
  private def bucketSql(vecExpr: String): String =
    Ann.planes(64, 8).zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product($vecExpr, ${planeLit(p)}) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** Names whose oracle is recorded at RUN time (Verify materializes the
    * literal-centroid SQL after the query executes), so a cold registry
    * shows them oracle-less. The doc-count gate (scripts/check_counts.sh)
    * counts these as oracle-checked, matching the driver's view. */
  val dynamicOracleNames: Seq[String] =
    Seq("q_ivf", "q_ivf_idx", "q_semdedup", "q_pq", "q_pq_idx", "q_ivfpq",
      "q_ivfpq_res", "q_ivfpq_idx", "q_ivfpq_res_idx", "q_knn_pq")

  /** `def`, not `val`: q_ivf's oracle is assembled from the model the run
    * records, so the registry must be re-materialized when Verify asks for
    * `SparkEntry.oracleSql` AFTER the query loop (the only evaluation-order
    * dependence; every other entry is a constant). */
  def all: Seq[Declared] = Seq(
    // int8 symmetric quantization prep (the serving/PQ compression step:
    // 4× smaller vectors, SIMD int8 dot products downstream): per-vector
    // max-abs scale, floor-quantize to [-127,127], report saturation +
    // reconstruction MAE. floor (not round) so no half-tie divergence
    // between engines; per-element double chains are IEEE-identical.
    // Narrow map, no shuffle — embarrassingly parallel at any scale.
    Declared(
      "q_quant",
      Some(
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |m AS (SELECT vec_id, v,
          |             list_aggregate(list_transform(v, x -> abs(x)), 'max') AS s
          |      FROM e)
          |SELECT vec_id, round(s, 4) AS scale,
          |       len(list_filter(v, x -> abs(floor(x * 127 / s)) >= 127)) AS n_sat,
          |       round(list_aggregate(
          |               list_transform(v, x -> abs(x - floor(x * 127 / s) * s / 127)),
          |               'sum') / len(v) * 1000, 4) AS mae_x1000
          |FROM m WHERE s > 0 ORDER BY vec_id""".stripMargin
      )
    ) { (spark, dir) =>
      val v = col("embedding").cast("array<double>")
      val s = aggregate(transform(v, x => abs(x)), lit(0.0d), (a, x) => greatest(a, x))
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), v.as("v"), s.as("s"))
        .where(col("s") > 0)
        .select(
          col("vec_id"),
          round(col("s"), 4).as("scale"),
          size(filter(col("v"),
            x => abs(floor(x * lit(127) / col("s"))) >= 127)).cast("long").as("n_sat"),
          round(aggregate(
            transform(col("v"),
              x => abs(x - floor(x * lit(127) / col("s")) * col("s") / 127)),
            lit(0.0d), (a, x) => a + x) / size(col("v")) * 1000, 4).as("mae_x1000"))
        .orderBy("vec_id")
    },

    // approximate top-10 for probe vec_id=0 (bucket join + exact rerank).
    // Oracle replays the same algorithm: literal-plane bucket ids,
    // multiprobe = hamming(bucket, probe bucket) <= 2, exact cosine rerank.
    Declared(
      "q_ann",
      Some(
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |b AS (SELECT vec_id, v, ${bucketSql("v")} AS bucket FROM e),
           |p AS (SELECT bucket AS pb, v AS pv FROM b WHERE vec_id = 0),
           |cand AS (SELECT b.vec_id,
           |                round(list_dot_product(b.v, p.pv)
           |                  / nullif(sqrt(list_dot_product(b.v, b.v))
           |                           * sqrt(list_dot_product(p.pv, p.pv)), 0), 4) AS sim
           |         FROM b, p WHERE bit_count(xor(b.bucket, p.pb)) <= 2)
           |SELECT vec_id, sim FROM cand ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
      )
    ) { (spark, dir) =>
      Ann.lshTopK(Tables.embeddings(spark, dir), probeId = 0L, k = 10)
    },

    // IVF approximate top-10: k-means coarse quantizer (deterministic
    // Lloyd fit), nprobe nearest inverted lists, exact rerank. The run
    // records the fitted model; [[ivfOracleSql]] replays everything
    // downstream of the fit from the centroid literals → full hash check
    // (the fit itself: AnnSpec recall + determinism).
    Declared("q_ivf", ivfOracleSql) { (spark, dir) =>
      val emb       = Tables.embeddings(spark, dir)
      val centroids = Ann.ivfFit(emb, c = 16, iters = 3)
      ivfCentroids = Some(centroids)
      Ann.ivfTopK(emb, probeId = 0L, k = 10, centroids, nprobe = 4)
    },

    // Persisted-IVF serving pair: fit the deterministic quantizer, write
    // the assignments partitioned BY CELL plus the small model frame,
    // reload both, and answer the probe from the reloaded index — the
    // nprobe filter is parquet partition pruning, so query I/O ∝
    // nprobe/C of the corpus. Same literal-centroid DuckDB replay as
    // q_ivf (recorded from THIS query's fit), so the whole persisted
    // path — assignment, layout round-trip, cell pruning, rerank — is
    // hash-checked bit-for-bit.
    Declared("q_ivf_idx", ivfIdxOracleSql) { (spark, dir) =>
      val emb       = Tables.embeddings(spark, dir)
      val centroids = Ann.ivfFit(emb, c = 16, iters = 3)
      ivfIdxCentroids = Some(centroids)
      val out = graft.ScratchDirs.dir("ivf-idx")
      Ann.ivfBuildIndex(emb, centroids)
        .write.mode("overwrite").partitionBy("cid").parquet(s"$out/cells")
      Ann.centroidsToDF(spark, centroids)
        .write.mode("overwrite").parquet(s"$out/model")
      val model = Ann.centroidsFromDF(spark.read.parquet(s"$out/model"))
      Ann.ivfQueryIndex(spark.read.parquet(s"$out/cells"), model,
        Ann.probeVector(emb, 0L), k = 10, nprobe = 4)
    },

    // Product-quantization ANN (Jégou et al., TPAMI 2011): fit m=8
    // independent 16-centroid subspace quantizers (each fit IS ivfFit on
    // the sliced subvector — deterministic, sample-bounded), encode every
    // vector to 8 small codes, rank the WHOLE corpus by the asymmetric
    // compressed-domain distance (an 8-term lookup sum — zero vector math
    // in the scan), exact-cosine rerank only the 50-row shortlist. The
    // run records codebooks + the probe's ADC table; the oracle replays
    // encode/ADC/shortlist/rerank from the literals term-for-term (same
    // left-to-right folds, argmin ties to the lowest code on both
    // engines) → full hash check downstream of the fit, like q_ivf. At
    // 100 TB the ranking pass reads m bytes/row (parquet prunes the raw
    // vectors), and the certified IVF cell pruning composes in front
    // unchanged — this is the scan-side compression half of the classic
    // IVFADC serving pair.
    Declared("q_pq", pqOracleSql) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      val books = Ann.pqFit(emb, m = PqM, ksub = PqKsub, iters = 3)
      pqModel = Some((books, Ann.pqAdcTable(books, Ann.probeVector(emb, 0L))))
      Ann.pqTopK(emb, probeId = 0L, k = 10, books, shortlist = PqShortlist)
    },

    // Persisted-PQ serving pair (build once / query many): encode the
    // corpus ONCE into a codes frame (m·4 bytes of code payload per row),
    // write it + the codebook frame to parquet, reload both, and answer
    // the probe from the RELOADED index — the ranking scan reads the
    // codes frame alone (raw vectors enter only through the ≤50-id pushed
    // In() rerank lookup). Reproduces q_pq's rows exactly (same shortlist
    // cut, tie rule, and rerank fold), and the oracle is the same
    // literal-codebook replay recorded from THIS query's fit — so the
    // whole persisted path (encode, parquet round-trip of codes + model,
    // ADC ranking, point-lookup rerank) is hash-checked bit-for-bit.
    Declared("q_pq_idx", pqIdxOracleSql) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      val books = Ann.pqFit(emb, m = PqM, ksub = PqKsub, iters = 3)
      pqIdxModel = Some((books, Ann.pqAdcTable(books, Ann.probeVector(emb, 0L))))
      val out = graft.ScratchDirs.dir("pq-idx")
      Ann.pqBuildIndex(emb, books)
        .write.mode("overwrite").parquet(s"$out/codes")
      Ann.pqCodebooksToDF(spark, books)
        .write.mode("overwrite").parquet(s"$out/model")
      val model = Ann.pqCodebooksFromDF(spark.read.parquet(s"$out/model"))
      Ann.pqQueryIndex(spark.read.parquet(s"$out/codes"), emb, model,
        Ann.probeVector(emb, 0L), k = 10, shortlist = PqShortlist)
    },

    // IVFADC — the classic composition (Jégou et al. 2011 §IV): the IVF
    // coarse quantizer prunes the scan to nprobe inverted lists
    // (partition pruning under a cid layout), and INSIDE those lists the
    // ranking is q_pq's compressed-domain ADC lookup sum, exact-cosine
    // rerank on the shortlist. At 100 TB the ranking pass reads
    // (nprobe/C of the corpus) × m code bytes per row. The oracle chains
    // the q_ivf replay's literal-centroid assignment + cell cut into the
    // q_pq replay's encode/ADC/rerank tail — both fits recorded from the
    // run, everything downstream hash-checked bit-for-bit.
    Declared("q_ivfpq", ivfpqOracleSql) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      // both models from ONE shared persisted sample, fits overlapped,
      // single unpersist after all of them (Ann.ivfPqFit — bit-identical
      // to the sequential ivfFit + pqFit by AnnSpec; naive overlap of the
      // standalone fits raced on a deduped cache entry, round-15 review)
      val (cents, books) = Ann.ivfPqFit(emb, c = 16, m = PqM, ksub = PqKsub, iters = 3)
      ivfpqModel = Some((cents, books, Ann.pqAdcTable(books, Ann.probeVector(emb, 0L))))
      Ann.ivfPqTopK(emb, probeId = 0L, k = 10, cents, books,
        nprobe = IvfPqNprobe, shortlist = PqShortlist)
    },

    // RESIDUAL IVFADC (Jégou et al. 2011 §IV, the full refinement —
    // VERDICT r14 task 1): codes quantize r = v − centroid(cid) instead
    // of raw vectors, so the coarse quantizer absorbs the coarse position
    // and the code bits are spent on the much tighter residual
    // distribution — the variant whose compressed-domain accuracy holds
    // as cells tighten (the c ∝ n regime). Each of the nprobe visited
    // lists ranks by its OWN ADC table built from the probe's residual
    // w.r.t. that list's centroid (the paper's per-list table). Engine:
    // compiled assign → cell cut → fused compiled subtract+encode →
    // per-cell compiled ADC (a ≤nprobe when-chain) → shortlist → exact
    // rerank on RAW vectors. Oracle: the chained literal replay —
    // centroid assignment → literal subtraction → literal-codebook
    // encode → per-cell literal-table CASE — recorded from the run's
    // fits, hash-checked bit-for-bit downstream of them. AnnSpec
    // additionally pins residual recall >= raw recall on planted
    // clusters under a deliberately coarse codebook.
    Declared("q_ivfpq_res", ivfpqResOracleSql) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      val cents = Ann.ivfFit(emb, c = 16, iters = 3)
      val books = Ann.pqFitResidual(emb, cents, m = PqM, ksub = PqKsub, iters = 3)
      ivfpqResModel = Some((cents, books,
        Ann.residualAdcTables(cents, books, Ann.probeVector(emb, 0L), IvfPqNprobe)))
      Ann.ivfPqResTopK(emb, probeId = 0L, k = 10, cents, books,
        nprobe = IvfPqNprobe, shortlist = PqShortlist)
    },

    // Persisted IVFADC serving pair (VERDICT r14 task 2): ONE
    // cid-partitioned codes frame (the q_ivf_idx layout) + the two small
    // model frames ARE the index — built once, written
    // partitionBy("cid"), reloaded, and the probe answered from the
    // RELOADED frames: the nprobe cut is parquet PARTITION PRUNING at
    // the scan (PlanSpec pins PartitionFilters), ranking reads the codes
    // frame alone (m·4 bytes of payload per surviving row), raw vectors
    // enter only through the ≤50-id pushed-In rerank. Reproduces
    // q_ivfpq's rows exactly — same shortlist cut, tie rules, rerank
    // fold (the q_pq_idx discipline, with the cell cut in front) — and
    // the oracle is the same chained literal replay recorded from THIS
    // query's fits, so the whole persisted path (assign+encode build,
    // parquet round-trip of codes + both models, pruned ADC ranking,
    // point-lookup rerank) is hash-checked bit-for-bit.
    Declared("q_ivfpq_idx", ivfpqIdxOracleSql) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      // both models from the one shared sample — see q_ivfpq's comment
      val (cents, books) = Ann.ivfPqFit(emb, c = 16, m = PqM, ksub = PqKsub, iters = 3)
      ivfpqIdxModel = Some((cents, books, Ann.pqAdcTable(books, Ann.probeVector(emb, 0L))))
      val out = graft.ScratchDirs.dir("ivfpq-idx")
      Ann.ivfPqBuildIndex(emb, cents, books)
        .write.mode("overwrite").partitionBy("cid").parquet(s"$out/codes")
      Ann.centroidsToDF(spark, cents).write.mode("overwrite").parquet(s"$out/coarse")
      Ann.pqCodebooksToDF(spark, books).write.mode("overwrite").parquet(s"$out/books")
      val cm = Ann.centroidsFromDF(spark.read.parquet(s"$out/coarse"))
      val bm = Ann.pqCodebooksFromDF(spark.read.parquet(s"$out/books"))
      Ann.ivfPqQueryIndex(spark.read.parquet(s"$out/codes"), emb, cm, bm,
        Ann.probeVector(emb, 0L), k = 10, nprobe = IvfPqNprobe, shortlist = PqShortlist)
    },

    // The two compositions above COMBINED — persisted residual IVFADC,
    // the full 100 TB serving shape of the refined variant: the
    // cid-partitioned codes frame holds residual codes, the query prunes
    // partitions, ranks with per-cell probe-residual tables from the
    // codes alone, and reranks through the pushed In(). Reproduces
    // q_ivfpq_res's rows exactly; oracle = the same residual chained
    // replay from THIS query's fits.
    Declared("q_ivfpq_res_idx", ivfpqResIdxOracleSql) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      val cents = Ann.ivfFit(emb, c = 16, iters = 3)
      val books = Ann.pqFitResidual(emb, cents, m = PqM, ksub = PqKsub, iters = 3)
      ivfpqResIdxModel = Some((cents, books,
        Ann.residualAdcTables(cents, books, Ann.probeVector(emb, 0L), IvfPqNprobe)))
      val out = graft.ScratchDirs.dir("ivfpq-res-idx")
      Ann.ivfPqBuildIndex(emb, cents, books, residual = true)
        .write.mode("overwrite").partitionBy("cid").parquet(s"$out/codes")
      Ann.centroidsToDF(spark, cents).write.mode("overwrite").parquet(s"$out/coarse")
      Ann.pqCodebooksToDF(spark, books).write.mode("overwrite").parquet(s"$out/books")
      val cm = Ann.centroidsFromDF(spark.read.parquet(s"$out/coarse"))
      val bm = Ann.pqCodebooksFromDF(spark.read.parquet(s"$out/books"))
      Ann.ivfPqQueryIndex(spark.read.parquet(s"$out/codes"), emb, cm, bm,
        Ann.probeVector(emb, 0L), k = 10, nprobe = IvfPqNprobe,
        shortlist = PqShortlist, residual = true)
    },

    // INCREMENTAL maintenance for the quantized index (VERDICT r14 task
    // 3, append leg — the q_hnsw_incr shape): persist a PQ codes frame
    // over the first 90% of the id span, freeze its codebook, append the
    // top-10% increment by ENCODING ONLY THE BATCH under the frozen
    // model (append cost ∝ batch; no merge, no re-fit), and certify the
    // updated index BIT-IDENTICAL to a from-scratch rebuild over the
    // full corpus under the same codebook, with the probe answered from
    // the updated index matching the compute path's rows exactly.
    Declared(
      "q_pq_incr",
      Some(
        """WITH c AS (SELECT count(*) AS cnt,
          |                  (max(vec_id) + 1) * 9 // 10 AS cut FROM embeddings)
          |SELECT cnt AS n,
          |       (SELECT count(*) FROM embeddings, c WHERE vec_id >= cut) AS incr_rows,
          |       true AS incr_equals_rebuild, true AS query_match
          |FROM c""".stripMargin
      )
    ) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      // cut by ID SPAN, not row count (the q_hnsw_incr rule: ScaleUp
      // strides ids by 1e7, so a row-count cut would not split slices).
      // ONE prelude aggregate folds the count and max jobs (round 16) —
      // same values, one driver round-trip fewer.
      val c0    = emb.agg(count(lit(1)), max(col("vec_id").cast("long"))).first()
      val n     = c0.getLong(0)
      val maxId = c0.getLong(1)
      val cut   = (maxId + 1L) * 9L / 10L
      val incr  = emb.where(col("vec_id") >= cut)
      val incrN = incr.count()
      // the codebook is fit on the BASE and FROZEN — the serving
      // reality: appends are encoded under the build-time model
      val books = Ann.pqFit(emb.where(col("vec_id") < cut), m = PqM, ksub = PqKsub, iters = 3)
      val out   = graft.ScratchDirs.dir("pq-incr")
      Ann.pqBuildIndex(emb.where(col("vec_id") < cut), books)
        .write.mode("overwrite").parquet(out)
      val updated = Ann.pqAppendIndex(spark.read.parquet(out), incr, books).persist()
      val full    = Ann.pqBuildIndex(emb, books).persist()
      try {
        // independent certificate actions over the two persisted frames —
        // overlapped (guide §2.6), values unchanged
        val probe = Ann.probeVector(emb, 0L)
        val ((eqA, eqB), (viaIdx, fresh)) = graft.Par.both(
          graft.Par.both(
            updated.except(full).isEmpty,
            full.except(updated).isEmpty),
          graft.Par.both(
            Ann.pqQueryIndex(updated, emb, books, probe, k = 10,
                shortlist = PqShortlist)
              .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq,
            Ann.pqTopK(emb, probeId = 0L, k = 10, books, shortlist = PqShortlist)
              .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq))
        val eq = eqA && eqB
        import spark.implicits._
        Seq((n, incrN, eq, viaIdx == fresh))
          .toDF("n", "incr_rows", "incr_equals_rebuild", "query_match")
      } finally {
        updated.unpersist(blocking = false)
        full.unpersist(blocking = false)
      }
    },

    // DELETE-TOLERANT maintenance for the quantized index (VERDICT r14
    // task 3, delete leg — the q_hnsw_del shape on the cid-partitioned
    // IVFADC layout): tombstone ~10% of the corpus (vec_id % 10 = 3,
    // spread across cells) as a SMALL id frame, serve THROUGH the
    // tombstones (a broadcast left-anti mask over the codes frame — the
    // masked answer must EQUAL the compute path over survivors exactly,
    // a stronger contract than NSW's recall floor, because codes are
    // per-row), then compact CELL-LOCALLY: only partitions a tombstone
    // hit are read, filtered, and dynamically overwritten (emptied cells
    // deleted explicitly); untouched cells' files are never rewritten.
    // Certify the compacted on-disk index BIT-IDENTICAL to a
    // from-scratch build over the post-delete corpus, probe answered
    // from it matching the fresh compute path.
    Declared(
      "q_ivfpq_del",
      Some(
        """SELECT (SELECT count(*) FROM embeddings) AS n,
          |       (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 3) AS n_deleted,
          |       true AS tomb_serve_match, true AS compact_equals_rebuild,
          |       true AS query_match""".stripMargin
      )
    ) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      val isDel = col("vec_id") % 10 === 3
      // ONE prelude aggregate for both scalar counts (round 16) — same
      // values as the two separate count jobs, one round-trip fewer
      val c0    = emb.agg(count(lit(1)), count(when(isDel, lit(1)))).first()
      val n     = c0.getLong(0)
      val nDel  = c0.getLong(1)
      // both models from the one shared sample — see q_ivfpq's comment
      val (cents, books) = Ann.ivfPqFit(emb, c = 16, m = PqM, ksub = PqKsub, iters = 3)
      val out   = graft.ScratchDirs.dir("ivfpq-del")
      Ann.ivfPqBuildIndex(emb, cents, books)
        .write.mode("overwrite").partitionBy("cid").parquet(s"$out/codes")
      val tombs = emb.where(isDel).select("vec_id")
      val probe = Ann.probeVector(emb, 0L) // 0 % 10 != 3: the probe survives
      val surv  = emb.where(!isDel)
      // fresh (compute path, never touches the on-disk index) and viaTomb
      // (must read the codes BEFORE compaction rewrites them) are
      // independent of each other — overlap; compaction stays strictly
      // after viaTomb because it mutates $out/codes in place
      val (fresh, viaTomb) = graft.Par.both(
        Ann.ivfPqTopK(surv, probeId = 0L, k = 10, cents, books,
            nprobe = IvfPqNprobe, shortlist = PqShortlist)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq,
        Ann.ivfPqQueryIndex(
            spark.read.parquet(s"$out/codes")
              .join(broadcast(tombs), Seq("vec_id"), "left_anti"),
            surv, cents, books, probe, k = 10,
            nprobe = IvfPqNprobe, shortlist = PqShortlist)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq)
      Ann.ivfPqCompactCells(spark, s"$out/codes", tombs)
      val compacted = spark.read.parquet(s"$out/codes")
      val rebuilt   = Ann.ivfPqBuildIndex(surv, cents, books)
      // post-compaction certificates are mutually independent — overlap
      val ((eqA, eqB), viaCompact) = graft.Par.both(
        graft.Par.both(
          compacted.select("vec_id", "cid", "codes").except(rebuilt).isEmpty,
          rebuilt.except(compacted.select("vec_id", "cid", "codes")).isEmpty),
        Ann.ivfPqQueryIndex(compacted, surv, cents, books, probe,
            k = 10, nprobe = IvfPqNprobe, shortlist = PqShortlist)
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq)
      val eq = eqA && eqB
      import spark.implicits._
      Seq((n, nDel, viaTomb == fresh, eq, viaCompact == fresh))
        .toDF("n", "n_deleted", "tomb_serve_match", "compact_equals_rebuild",
          "query_match")
    },

    // SemDeDup semantic dedup (Abbas et al. 2023): deterministic k-means
    // clustering of the embedding space, near-dup pairs generated ONLY
    // within clusters (cosine >= 0.45, the q_embdup corpus threshold),
    // keep-first drop of the higher id. The run records its fitted
    // centroids; the oracle replays assignment + cluster-local pairs +
    // drops from the literals bit-for-bit. Scale: pair work is
    // n·(n/c)/2, and with c grown ∝ n (the paper's regime — cluster size
    // held constant; assignment then via Ann.assignCentroidJoin's
    // broadcast model frame instead of c inline expressions) the stage is
    // LINEAR in corpus size — the at-scale answer to q_embdup's honest
    // but quadratic exact all-pairs. The two assignment plans' bit-
    // equality at factor 1000 is certified by `Probe --semdedup-cert`.
    Declared("q_semdedup", semOracleSql) { (spark, dir) =>
      val emb       = Tables.embeddings(spark, dir)
      val centroids = Ann.ivfFit(emb, c = SemC, iters = 3)
      semCentroids = Some(centroids)
      Ann.semDedupStats(emb, centroids, tau = SemTau)
    },

    // Graph-ANN top-10: shard-local navigable-small-world graphs (the
    // HNSW family) built per partition inside mapPartitions, probe
    // beam-searched per shard, global merge of shards·k candidates.
    // Graph construction is data-order-dependent → the ANSWER isn't
    // SQL-portable; instead the query emits a self-certifying row the
    // oracle CAN pin: recall@10 vs the in-plan exact scan meets the 0.8
    // floor, and every reported sim equals the exact cosine for that id
    // (catches rerank/merge bugs, not just ranking luck). AnnSpec
    // additionally pins mean recall >= 0.9 across probes.
    //
    // BENCH SEMANTICS: the timed "q_hnsw" number is the WHOLE certificate
    // — NSW build + beam search + the O(n·d) brute-force ground truth +
    // the rerank check — not the ANN query alone. The build dominates
    // (O(n·m·ef·d) vs the scan's single O(n·d) pass), so the scaling
    // curve (BASELINE.md: 36×/decade at factor 1000, ≈ 10× data × richer
    // graphs) is a build-cost story; a serving deployment builds once and
    // amortizes, which the per-query bench number deliberately does not.
    Declared(
      "q_hnsw",
      Some(
        """SELECT CAST(10 AS BIGINT) AS k,
          |       (SELECT count(*) FROM embeddings) AS n,
          |       CAST(0.8 AS DOUBLE) AS recall_floor,
          |       true AS recall_met, true AS sims_exact""".stripMargin
      )
    ) { (spark, dir) =>
      val emb = Tables.embeddings(spark, dir)
      // the ANN leg (graph build + beam) and the brute-force ground truth
      // are independent — overlap them (§2.6), values unchanged
      val (nswRows, exactIds) = graft.Par.both(
        Ann.nswTopK(emb, probeId = 0L, k = 10).collect(), // k rows
        Ann.bruteForceTopK(emb, probeId = 0L, k = 10)
          .collect().map(_.getLong(0)).toSet)
      val nswIds = nswRows.map(_.getLong(0))
      val probe = emb.filter(col("vec_id") === 0L).select(col("embedding").as("p"))
      val exactSim = emb.where(col("vec_id").isin(nswIds.toIndexedSeq: _*))
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(graft.functions.Similarity.cosineSimilarity(col("embedding"), col("p")), 4))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val hits      = nswIds.count(exactIds)
      val simsExact = nswRows.forall(r => exactSim(r.getLong(0)) == r.getDouble(1))
      import spark.implicits._
      Seq((10L, emb.count(), 0.8, hits >= 8, simsExact))
        .toDF("k", "n", "recall_floor", "recall_met", "sims_exact")
    },

    // Persisted-index ANN — the build-once/query-many serving shape the
    // q_hnsw bench note points at: build the NSW shard graphs ONCE
    // (Ann.nswBuildIndex), round-trip the self-contained index through
    // parquet, and answer the probe from the RELOADED index with no graph
    // construction (Ann.nswQueryIndex). Certificate row the oracle pins:
    // recall@10 vs the exact scan meets the 0.8 floor AND the reloaded
    // index reproduces the fresh build-and-search rows exactly — sharding,
    // insertion order and edge order are all deterministic, so persistence
    // must be lossless down to the edge lists.
    Declared(
      "q_hnsw_idx",
      Some(
        """SELECT CAST(10 AS BIGINT) AS k,
          |       (SELECT count(*) FROM embeddings) AS n,
          |       true AS recall_met, true AS idx_matches_fresh""".stripMargin
      )
    ) { (spark, dir) =>
      val emb = Tables.embeddings(spark, dir)
      val out = graft.ScratchDirs.dir("nsw-idx")
      Ann.nswBuildIndex(emb).write.mode("overwrite").parquet(out)
      val index = spark.read.parquet(out)
      // the three certificate actions are independent — the fresh leg is
      // its own full graph build; overlap them (§2.6), values unchanged
      val probe = Ann.probeVector(emb, 0L)
      val (viaIdx, fresh, exactIds) = graft.Par.all3(
        Ann.nswQueryIndex(index, probe, k = 10)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
        Ann.nswTopK(emb, probeId = 0L, k = 10)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
        Ann.bruteForceTopK(emb, probeId = 0L, k = 10)
          .collect().map(_.getLong(0)).toSet)
      val hits = viaIdx.map(_._1).count(exactIds)
      import spark.implicits._
      Seq((10L, emb.count(), hits >= 8, viaIdx == fresh))
        .toDF("k", "n", "recall_met", "idx_matches_fresh")
    },

    // INCREMENTAL index maintenance — the recurring-crawl shape (the
    // vector-side analog of q_dedup_incr): persist an index over the
    // first 90% of the corpus by id, append the top-10% increment with
    // NO rebuild of the existing shard graphs (each shard continues
    // construction from its stored adjacency), and certify that the
    // updated index is BIT-IDENTICAL to a full rebuild at the same shard
    // count (append-only ids ⇒ per-shard insertion order is globally
    // sorted ⇒ same graphs — the determinism contract), and that a probe
    // answered from it matches the fresh build-and-search rows.
    Declared(
      "q_hnsw_incr",
      Some(
        """WITH c AS (SELECT count(*) AS cnt,
          |                  (max(vec_id) + 1) * 9 // 10 AS cut FROM embeddings)
          |SELECT cnt AS n,
          |       (SELECT count(*) FROM embeddings, c WHERE vec_id >= cut) AS incr_rows,
          |       true AS incr_equals_rebuild, true AS query_match
          |FROM c""".stripMargin
      )
    ) { (spark, dir) =>
      val emb = Tables.embeddings(spark, dir)
      // cut by ID SPAN, not row count (ADVICE r10): ScaleUp slices stride
      // ids by 1e7, so `vec_id < n*9/10` would select only copy 0 there
      // and the reported incr_rows would not be the appended row count.
      // floor(0.9·(max_id+1)) splits the actual id space — for dense
      // 0..n-1 ids it degenerates to the old n*9/10 — and incr_rows below
      // is the REAL appended count, mirrored exactly by the oracle.
      // ONE prelude aggregate folds the count and max jobs (round 16).
      val c0    = emb.agg(count(lit(1)), max(col("vec_id").cast("long"))).first()
      val n     = c0.getLong(0)
      val maxId = c0.getLong(1)
      val cut   = (maxId + 1L) * 9L / 10L
      val incrN = emb.where(col("vec_id") >= cut).count()
      // pin the FULL corpus's shard count on both paths so the equality
      // is well-defined at every scale (a fresh build sized by the grown
      // corpus must not out-shard the increment path)
      val s = math.max(4, ((n + 4095) / 4096).toInt)
      val out = graft.ScratchDirs.dir("nsw-incr")
      Ann.nswBuildIndex(emb.where(col("vec_id") < cut), shards = s)
        .write.mode("overwrite").parquet(out)
      // persist both frames: the two EXCEPT directions and the probe
      // re-evaluate them, and each re-evaluation re-runs the O(n·m·ef·d)
      // graph construction — the dominant cost of this certificate
      val updated = Ann.nswInsertIndex(
        spark.read.parquet(out), emb.where(col("vec_id") >= cut), nShards = s).persist()
      val full = Ann.nswBuildIndex(emb, shards = s).persist()
      try {
        // the four certificate actions are mutually independent given the
        // two persisted frames — overlap them (guide §2.6) instead of
        // paying four sequential job round-trips, two of which are full
        // graph constructions. Values unchanged; cached blocks are
        // computed once under Spark's per-block lock.
        val probe = Ann.probeVector(emb, 0L)
        val ((eqA, eqB), (viaIdx, fresh)) = graft.Par.both(
          graft.Par.both(
            updated.except(full).isEmpty,
            full.except(updated).isEmpty),
          graft.Par.both(
            Ann.nswQueryIndex(updated, probe, k = 10)
              .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
            Ann.nswTopK(emb, probeId = 0L, k = 10)
              .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq))
        val eq = eqA && eqB
        import spark.implicits._
        Seq((n, incrN, eq, viaIdx == fresh))
          .toDF("n", "incr_rows", "incr_equals_rebuild", "query_match")
      } finally {
        updated.unpersist(blocking = false)
        full.unpersist(blocking = false)
      }
    },

    // DELETE-TOLERANT index maintenance (VERDICT r11/r12 task 7), the
    // third leg of the serving-lifecycle trio (build → q_hnsw_idx,
    // append → q_hnsw_incr, delete → here): tombstone ~10% of the corpus
    // (vec_id % 10 = 3 — spread across every shard) on the persisted
    // index, serve THROUGH the tombstones (deleted nodes keep routing,
    // stop being emitted), then compact — rebuilding ONLY the shards a
    // tombstone actually hit — and certify the compacted index is
    // BIT-IDENTICAL to a from-scratch build over the post-delete corpus
    // at the same shard count, with the probe answered from it matching
    // the fresh build-and-search rows. tomb_serve_clean pins the serve
    // path: k rows, none deleted, recall vs the exact survivor scan ≥ 0.8.
    Declared(
      "q_hnsw_del",
      Some(
        """SELECT (SELECT count(*) FROM embeddings) AS n,
          |       (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 3) AS n_deleted,
          |       true AS compact_equals_rebuild, true AS query_match,
          |       true AS tomb_serve_clean""".stripMargin
      )
    ) { (spark, dir) =>
      val emb = Tables.embeddings(spark, dir)
      val isDel = col("vec_id") % 10 === 3
      // ONE prelude aggregate for both scalar counts (round 16) — same
      // values as the two separate count jobs, one round-trip fewer
      val c0   = emb.agg(count(lit(1)), count(when(isDel, lit(1)))).first()
      val n    = c0.getLong(0)
      val nDel = c0.getLong(1)
      // pin the FULL corpus's shard count on both paths (the q_hnsw_incr
      // rule): the compacted index keeps the build's layout, so the
      // from-scratch rebuild must not re-shard by the shrunken count
      val s   = math.max(4, ((n + 4095) / 4096).toInt)
      val out = graft.ScratchDirs.dir("nsw-del")
      Ann.nswBuildIndex(emb, shards = s).write.mode("overwrite").parquet(out)
      val tombstoned = Ann.nswDeleteIndex(
        spark.read.parquet(out), emb.where(isDel).select("vec_id")).persist()
      val compacted = Ann.nswCompactIndex(tombstoned).persist()
      val rebuilt   = Ann.nswBuildIndex(emb.where(!isDel), shards = s).persist()
      try {
        // six mutually independent certificate actions over the three
        // persisted frames — two of them (fresh nswTopK, bruteForce) build
        // or scan from the corpus independently. Overlap all of them
        // (guide §2.6): the sequential chain was four full graph
        // constructions + probe collects back-to-back, each using a
        // fraction of the cores. Values unchanged.
        val probe = Ann.probeVector(emb, 0L)
        val ((eqA, eqB), (viaCompact, fresh), (viaTomb, exactIds)) = graft.Par.all3(
          graft.Par.both(
            compacted.except(rebuilt).isEmpty,
            rebuilt.except(compacted).isEmpty),
          graft.Par.both(
            Ann.nswQueryIndex(compacted, probe, k = 10)
              .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
            Ann.nswTopK(emb.where(!isDel), probeId = 0L, k = 10, shards = s)
              .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq),
          // serve THROUGH tombstones: no deleted id may surface, and the
          // ids must still hit the exact survivor scan at the 0.8 floor
          graft.Par.both(
            Ann.nswQueryIndex(tombstoned, probe, k = 10)
              .collect().map(_.getLong(0)).toSeq,
            Ann.bruteForceTopK(emb.where(!isDel), probeId = 0L, k = 10)
              .collect().map(_.getLong(0)).toSet))
        val eq = eqA && eqB
        val tombClean = viaTomb.size == 10 &&
          viaTomb.forall(_ % 10 != 3) && viaTomb.count(exactIds) >= 8
        import spark.implicits._
        Seq((n, nDel, eq, viaCompact == fresh, tombClean))
          .toDF("n", "n_deleted", "compact_equals_rebuild", "query_match",
            "tomb_serve_clean")
      } finally {
        tombstoned.unpersist(blocking = false)
        compacted.unpersist(blocking = false)
        rebuilt.unpersist(blocking = false)
      }
    },

    // batch k-NN join: exact top-5 neighbors for every probe vec_id < 10 —
    // the training-data "find similar examples per sample" shape
    Declared(
      "q_knn",
      Some(
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10),
          |sims AS (
          |  SELECT p.probe_id, e.vec_id,
          |         round(list_dot_product(e.v, p.pv)
          |           / nullif(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.pv, p.pv)), 0), 4) AS sim
          |  FROM e CROSS JOIN p WHERE e.vec_id <> p.probe_id),
          |r AS (SELECT probe_id, vec_id, sim,
          |             row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
          |      FROM sims)
          |SELECT probe_id, vec_id, sim, rn FROM r WHERE rn <= 5
          |ORDER BY probe_id, rn""".stripMargin
      )
    ) { (spark, dir) =>
      val emb = Tables.embeddings(spark, dir)
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p"))
      Ann.knnJoin(emb, probes, k = 5)
        .select("probe_id", "vec_id", "sim", "rn")
        .orderBy("probe_id", "rn")
    },

    // batch PQ k-NN join — the COMPRESSED-DOMAIN shape of q_knn: every
    // (row, probe) pair ranked by the ADC lookup sum (m adds vs a D-dim
    // cosine — D/m ≈ 8× less pair math), per-probe 50-row shortlist,
    // exact-cosine rerank only on the winners. The probe side stays
    // distributed: each probe's m×ksub table is built IN the plan
    // (graft_adc_table, one compiled loop) and broadcast with the
    // frame; the pair shuffle carries (probe_id, id, adc) triples only,
    // and the rerank re-enters the corpus through a broadcast join of
    // the tiny shortlist. Oracle: the probe tables replay with the SAME
    // encode fragments as the corpus codes (tab(s) on a probe IS ds_s
    // of the probe vector), the adc as an explicit + chain in subspace
    // order, both windows replayed — hash-checked bit-for-bit
    // downstream of the recorded fit.
    Declared("q_knn_pq", pqKnnOracleSql) { (spark, dir) =>
      val emb   = Tables.embeddings(spark, dir)
      val books = Ann.pqFit(emb, m = PqM, ksub = PqKsub, iters = 3)
      pqKnnModel = Some(books)
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p"))
      Ann.pqKnnJoin(emb, probes, k = 5, books, shortlist = PqShortlist)
        .select("probe_id", "vec_id", "sim", "rn")
        .orderBy("probe_id", "rn")
    },

    // batch LSH k-NN join: the shuffle-on-bucket scale shape of q_knn for
    // probe sets too large to broadcast. Same literal-plane oracle trick
    // as q_ann — the hash check proves the bucket join loses exactly the
    // candidates LSH says it may (per-probe recall vs the exact join is
    // additionally asserted in AnnSpec on planted clusters).
    Declared(
      "q_knn_lsh",
      Some(
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |b AS (SELECT vec_id, v, ${bucketSql("v")} AS bucket FROM e),
           |p AS (SELECT vec_id AS probe_id, bucket AS pb, v AS pv FROM b WHERE vec_id < 10),
           |cand AS (SELECT p.probe_id, b.vec_id,
           |                round(list_dot_product(b.v, p.pv)
           |                  / nullif(sqrt(list_dot_product(b.v, b.v))
           |                           * sqrt(list_dot_product(p.pv, p.pv)), 0), 4) AS sim
           |         FROM b JOIN p
           |           ON bit_count(xor(b.bucket, p.pb)) <= 2 AND b.vec_id <> p.probe_id),
           |r AS (SELECT probe_id, vec_id, sim,
           |             row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
           |      FROM cand)
           |SELECT probe_id, vec_id, sim, rn FROM r WHERE rn <= 5
           |ORDER BY probe_id, rn""".stripMargin
      )
    ) { (spark, dir) =>
      val emb = Tables.embeddings(spark, dir)
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p"))
      Ann.lshKnnJoin(emb, probes, k = 5)
        .select("probe_id", "vec_id", "sim", "rn")
        .orderBy("probe_id", "rn")
    },

    // binary media column + typed metadata (schema-level plumbing)
    Declared(
      "q_media",
      Some(
        """SELECT doc_id AS asset_id,
          |       CASE WHEN n_chars % 3 = 0 THEN 'image'
          |            WHEN n_chars % 3 = 1 THEN 'audio'
          |            ELSE 'video' END AS kind,
          |       octet_length(encode(text)) AS n_bytes,
          |       md5(text) AS digest
          |FROM documents ORDER BY asset_id""".stripMargin
      )
    ) { (spark, dir) =>
      Multimodal.mediaFrame(Tables.documents(spark, dir))
        .select(
          col("asset_id"),
          col("meta.kind").as("kind"),
          col("meta.n_bytes").as("n_bytes"),
          md5(col("media")).as("digest"))
        .orderBy("asset_id")
    },

    // frame sampling: every 64-byte slice of the payload as its own row
    // (video-frame extraction shape, pure SQL on BINARY); payloads are
    // ASCII so the oracle re-derives frames as 64-char regexp chunks
    Declared(
      "q_frames",
      Some(
        """SELECT doc_id AS asset_id, ord AS frame_no, frame
          |FROM (SELECT doc_id,
          |        unnest(regexp_extract_all(text, '.{1,64}')) AS frame,
          |        generate_subscripts(regexp_extract_all(text, '.{1,64}'), 1) AS ord
          |      FROM documents WHERE doc_id < 10)
          |ORDER BY asset_id, frame_no""".stripMargin
      )
    ) { (spark, dir) =>
      Multimodal.mediaFrame(Tables.documents(spark, dir))
        .filter(col("asset_id") < 10)
        .select(col("asset_id"),
          posexplode(Multimodal.frameSample(col("media"), 64)).as(Seq("pos", "fbin")))
        .select(
          col("asset_id"),
          (col("pos") + 1).cast("long").as("frame_no"),
          decode(col("fbin"), "UTF-8").as("frame"))
        .orderBy("asset_id", "frame_no")
    },

    // partition-wise batched decode (mapPartitions stub codec) — outputs
    // re-derived in SQL byte arithmetic by the oracle. mean_byte is
    // emitted UNROUNDED on both sides: each engine computes the identical
    // exact-integer-sum / length double, and the driver's compare rounds
    // floats itself — an in-query round(,4) split the two engines at a
    // decimal half boundary (84.05375) at factor 100.
    Declared(
      "q_media_decode",
      Some(
        """SELECT doc_id AS asset_id,
          |       cast(ceil(octet_length(encode(text)) / 64.0) as int) AS n_frames,
          |       coalesce(CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS DOUBLE)
          |                / nullif(octet_length(encode(text)), 0), 0.0) AS mean_byte
          |FROM documents ORDER BY asset_id""".stripMargin
      )
    ) { (spark, dir) =>
      val media = Multimodal.mediaFrame(Tables.documents(spark, dir))
      Multimodal.decodeFeatures(spark, media)
        .select(col("asset_id"), col("n_frames"), col("mean_byte"))
        .orderBy("asset_id")
    },

    // resize/thumbnail stage (stride-subsample stub codec, mapPartitions):
    // the oracle re-derives the strided byte sample in SQL — output byte i
    // = input byte i*n//m (integer division, DuckDB `//`)
    Declared(
      "q_media_resize",
      Some(
        // coalesce: an empty document yields sum-of-[] = NULL in SQL where
        // the stub emits 0.0 (text is ASCII by generation — byte==char; a
        // non-ASCII corpus would need a byte-level oracle). Unrounded
        // exact-sum/len mean for the same reason as q_media_decode.
        """SELECT doc_id AS asset_id,
          |       CAST(least(len(text), 256) AS INT) AS out_bytes,
          |       coalesce(CAST(list_sum(
          |         list_transform(range(least(len(text), 256)),
          |           i -> ascii(text[CAST(i * len(text) // least(len(text), 256) AS INT) + 1]))) AS DOUBLE)
          |         / nullif(least(len(text), 256), 0), 0.0) AS mean_byte
          |FROM documents ORDER BY asset_id""".stripMargin
      )
    ) { (spark, dir) =>
      val media = Multimodal.mediaFrame(Tables.documents(spark, dir))
      Multimodal.resizeAssets(spark, media, targetBytes = 256)
        .select(col("asset_id"), col("out_bytes"), col("mean_byte"))
        .orderBy("asset_id")
    },

    // Perceptual hash (dHash) of every media payload — the raw-media
    // fingerprint q_mediadup's banding consumes, pinned row-for-row on
    // the WHOLE corpus (q_mediadup's keep-first output only surfaces the
    // near-dup tail, which is sparse on a distinct-text corpus — this
    // query is what makes the hash replay itself fully hash-checked).
    // Narrow mapPartitions batch map, zero shuffles before the
    // presentation sort.
    Declared(
      "q_phash",
      Some(
        """SELECT doc_id AS asset_id,
          |       coalesce(CAST(list_sum(list_transform(range(least(len(text), 64) - 1),
          |         i -> CASE WHEN ascii(text[CAST(i * len(text) // least(len(text), 64) AS INT) + 1])
          |                      > ascii(text[CAST((i + 1) * len(text) // least(len(text), 64) AS INT) + 1])
          |                   THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT), 0) AS dhash
          |FROM documents ORDER BY asset_id""".stripMargin
      )
    ) { (spark, dir) =>
      val media = Multimodal.mediaFrame(Tables.documents(spark, dir))
      Multimodal.perceptualHashes(spark, media).toDF().orderBy("asset_id")
    },

    // Perceptual-hash media NEAR-dup (VERDICT r13 item 4 — the raw-media
    // analog of MinHash-LSH): dHash every payload (mapPartitions batched
    // stub codec, Multimodal.dHash — stride-sample to the 64-byte grid,
    // one bit per byte gradient), then find assets with an EARLIER asset
    // within Hamming distance 3 — keep-first drop semantics, like every
    // dedup stage here. Plan: the 63-bit hash splits into 4 disjoint
    // 16-bit bands; candidates must share a band (ONE shuffle keyed on
    // (band, value)), and the exact Hamming verify rides IN the left-semi
    // join condition, so no pair set materializes and a probe row stops
    // at its first qualifying partner (the semDedupDropped shape — on
    // ScaleUp slices every asset has factor× identical copies and a pair
    // formulation would shuffle copies² rows). BUCKET CLOSURE: banding is
    // LOSSLESS at tau = 3 by pigeonhole — 4 disjoint bands and <= 3
    // differing bits leave >= 1 band bit-identical, so every qualifying
    // pair shares a bucket and the exact verify inside the bucket makes
    // the plan equal to the all-pairs definition. The oracle replays the
    // hash from raw bytes (deterministic byte math, ASCII corpus — the
    // q_media_resize technique) and the SAME banded candidate cut — an
    // equi join, so the oracle runs at every sweep scale where the
    // definitional all-pairs EXISTS (no equi key) is O(n²) in any engine.
    // The pigeonhole equivalence the banded oracle leans on is NOT taken
    // on faith: MultimodalSpec checks closure exhaustively over planted
    // <= 3-bit flips AND runs the banded plan against a driver-side
    // brute-force all-pairs drop set; q_phash hash-checks the fingerprint
    // itself corpus-wide at every scale. The oracle's candidate side is
    // COLLAPSED to one min-asset_id representative per (band, bval,
    // dhash) class (round 15): the semi decision "an earlier asset
    // shares a band within Hamming 3" depends, for a fixed candidate
    // dhash value in a bucket, only on the SMALLEST candidate id — so
    // the collapse preserves every EXISTS verdict exactly while cutting
    // the pair stream from copies² to ~|distinct classes| per bucket,
    // which is what lets this oracle run even on ScaleUp slices where
    // every asset has factor× identical copies (the factor-1000 sweep).
    Declared(
      "q_mediadup",
      Some(
        """WITH h AS (
          |  SELECT doc_id AS asset_id,
          |         coalesce(CAST(list_sum(list_transform(range(least(len(text), 64) - 1),
          |           i -> CASE WHEN ascii(text[CAST(i * len(text) // least(len(text), 64) AS INT) + 1])
          |                        > ascii(text[CAST((i + 1) * len(text) // least(len(text), 64) AS INT) + 1])
          |                     THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT), 0) AS dhash
          |  FROM documents),
          |bands AS (
          |  SELECT asset_id, dhash, band, (dhash >> (band * 16)) & 65535 AS bval
          |  FROM h, (SELECT unnest(range(4)) AS band)),
          |minb AS (
          |  SELECT band, bval, dhash, min(asset_id) AS min_aid
          |  FROM bands GROUP BY band, bval, dhash)
          |SELECT DISTINCT b.asset_id AS asset_id, b.dhash AS dhash
          |FROM bands b JOIN minb a
          |  ON a.band = b.band AND a.bval = b.bval AND a.min_aid < b.asset_id
          | AND bit_count(xor(a.dhash, b.dhash)) <= 3
          |ORDER BY asset_id""".stripMargin
      )
    ) { (spark, dir) =>
      val media  = Multimodal.mediaFrame(Tables.documents(spark, dir))
      val hashes = Multimodal.perceptualHashes(spark, media).toDF()
      val bands = hashes.select(col("asset_id"), col("dhash"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bval"))): _*)).as("bb"))
        .select(col("asset_id"), col("dhash"), col("bb.band").as("band"), col("bb.bval").as("bval"))
      val earlier = bands.select(
        col("band").as("band_a"), col("bval").as("bval_a"),
        col("asset_id").as("aid"), col("dhash").as("ha"))
      bands.join(earlier,
          col("band") === col("band_a") && col("bval") === col("bval_a") &&
            col("aid") < col("asset_id") &&
            expr("bit_count(dhash ^ ha) <= 3"),
          "left_semi")
        .select("asset_id", "dhash")
        .distinct()
        .orderBy("asset_id")
    },

    // per-label embedding centroids (the k-means E-step / class-prototype
    // computation): posexplode to (label, dim, component), partial-agg mean
    // per (label, dim), then fold dims back into the centroid L2 norm. Two
    // map-side-combining shuffles whose reduce keys are label×dim — at
    // 100 TB the heavy first shuffle carries one double per (row, dim) and
    // collapses 1000× in the combiner; nothing is ever driver-side.
    Declared(
      "q_centroids",
      Some(
        """WITH comp AS (
          |  SELECT label,
          |         unnest(range(1, len(embedding) + 1)) AS dim,
          |         unnest(embedding) AS e
          |  FROM embeddings),
          |m AS (SELECT label, dim, avg(e) AS m FROM comp GROUP BY label, dim)
          |SELECT label, count(*) AS dims,
          |       round(sqrt(sum(m * m)), 4) AS centroid_norm,
          |       round(sum(abs(m)), 4) AS centroid_l1
          |FROM m GROUP BY label ORDER BY label""".stripMargin
      )
    ) { (spark, dir) =>
      Tables.embeddings(spark, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim0", "e")))
        .groupBy(col("label"), (col("dim0") + 1).as("dim"))
        .agg(avg(col("e").cast("double")).as("m"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("dims"),
          round(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"),
          round(sum(abs(col("m"))), 4).as("centroid_l1"))
        .orderBy("label")
    }
  )
}
