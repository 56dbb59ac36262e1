package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed user-defined aggregation surface (SURVEY §2.2 "UDF/UDAF/UDTF" row):
 * `Aggregator[IN, BUF, OUT]` with case-class/tuple Encoders — the
 * Spark-native UDAF shape. Catalyst plans it partial/final like any
 * built-in aggregate (map-side combine via `reduce`, shuffle of buffers,
 * `merge` on the reduce side), so the scale behavior is identical to a
 * built-in `sum`.
 */
object Aggregators {

  /** Weighted arithmetic mean: IN = (value, weight). */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
