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

  /** cos(a, b) = a·b / (‖a‖‖b‖). NULL when either vector is all-zero
    * (cosine undefined; `nullif` keeps the expression ANSI-safe — Spark 4's
    * default ANSI mode makes a plain divide-by-zero a runtime error). */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  /**
   * cos(a, p) against a probe whose norm ‖p‖ is already known — the
   * at-scale path for probe scans: a SINGLE fold per row accumulates both
   * a·p and ‖a‖² (struct accumulator, still fully codegen'd), instead of
   * three independent array traversals, and the constant ‖p‖ is computed
   * once on the 1-row probe side rather than per scanned row.
   */
  def cosineVsProbe(a: Column, probe: Column, probeNorm: Column): Column = {
    val acc = aggregate(
      zip_with(a, probe, (x, y) => {
        val xd = x.cast("double")
        struct((xd * y.cast("double")).as("dot"), (xd * xd).as("nsq"))
      }),
      struct(lit(0.0).as("dot"), lit(0.0).as("nsq")),
      (s, e) => struct(
        (s.getField("dot") + e.getField("dot")).as("dot"),
        (s.getField("nsq") + e.getField("nsq")).as("nsq"))
    )
    acc.getField("dot") / nullif(sqrt(acc.getField("nsq")) * probeNorm, lit(0.0))
  }

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
