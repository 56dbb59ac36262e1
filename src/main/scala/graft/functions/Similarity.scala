package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math over `ARRAY<FLOAT>` embedding columns, built entirely from
 * codegen'd higher-order functions (`zip_with` / `aggregate` /
 * `transform`) — no UDFs, so the whole computation stays inside
 * whole-stage codegen and columnar batch processing.
 *
 * All arithmetic is promoted to DOUBLE before accumulation (left-to-right
 * sequential fold), which is the same evaluation order the DuckDB oracle
 * uses via `list_dot_product(CAST(... AS DOUBLE[]), ...)`.
 */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ in double precision. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** cos(a, b) = a·b / (‖a‖‖b‖). NaN when either vector is all-zero. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

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
