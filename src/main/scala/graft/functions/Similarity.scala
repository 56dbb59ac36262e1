package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math over `ARRAY<FLOAT>` embedding columns.
 *
 * The hot-path entry points route to graft's native codegen expressions
 * (`graft_dot` / `graft_cosine`, [[graft.expressions.VectorExpressions]],
 * registered via SparkSessionExtensions): Spark's higher-order functions
 * evaluate interpreted (no whole-stage codegen), which made the
 * 12.5M-pair cosine scan the sf0.1 bench bottleneck; the fused-loop
 * expressions are ~10× faster and keep the stage inside codegen. The HOF
 * formulations are retained (`*Hof`) as the dependency-free reference
 * implementation the specs cross-check against.
 *
 * All arithmetic is promoted to DOUBLE and accumulated left-to-right —
 * the same evaluation order the DuckDB oracle uses via
 * `list_dot_product(CAST(... AS DOUBLE[]), ...)`.
 */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision (codegen'd fused loop). */
  def dotProduct(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Σ aᵢ·bᵢ via interpreted HOFs — reference implementation. */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ in double precision. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** cos(a, b) = a·b / (‖a‖‖b‖), one fused codegen'd loop (dot and both
    * norms accumulated together). NULL when either vector is all-zero
    * (cosine undefined; ANSI-safe — no divide-by-zero). */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** HOF reference implementation of cosine (interpreted; spec cross-check). */
  def cosineSimilarityHof(a: Column, b: Column): Column =
    dotProductHof(a, b) /
      nullif(sqrt(dotProductHof(a, a)) * sqrt(dotProductHof(b, b)), lit(0.0))

  /**
   * cos(a, p) for probe scans. The fused expression already computes dot
   * and both norms in the same single pass, so this simply delegates —
   * the probeNorm argument is retained for API stability and ignored
   * (recomputing ‖p‖ inside the fused loop is cheaper than a second
   * column reference at codegen level).
   */
  def cosineVsProbe(a: Column, probe: Column, probeNorm: Column): Column =
    cosineSimilarity(a, probe)

  /** Squared euclidean distance Σ (aᵢ−bᵢ)². */
  def squaredL2Distance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)
}
