package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (SURVEY §2.2 "custom typed agg",
  * `Aggregator[IN, BUF, OUT]`).
  *
  * The reference exposes no user-aggregation surface at all (its only
  * extension points are Bucketer/Writer, reference
  * RowOrcBucketingSink.java:251-254); these are the Spark-native way to
  * add one. Both aggregators are associative + commutative, so Spark runs
  * them with map-side partial aggregation — the shuffle carries one
  * buffer per (partition, group), the only shape that survives 100 TB.
  */
object VecAgg {

  /** Elementwise sum of fixed-dimension double vectors. Powers IVF
    * centroid computation (mean = sum/count) and SimHash bit tallies
    * without exploding rows ×dim through the shuffle: the buffer is one
    * dim-length array per group per partition.
    */
  final class VecSum(dim: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.fill(dim)(0.0)
    override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
      var i = 0
      while (i < dim) { b(i) += a(i); i += 1 }
      b
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < dim) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Double]): Seq[Double] = b.toSeq
    // native primitive-array encoder: the buffer crosses the shuffle once
    // per (group, partition); Java serialization there is pure overhead
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact weighted average via integer-quantized partial sums — the
    * order-independent formulation of graft.util.Exact lifted into a
    * reusable typed aggregator: Σ(w·x) and Σw accumulate as quantized
    * integral doubles (exact below 2^53), one division at finish.
    * IN = (value, weight).
    */
  final class WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    private val S = 10000.0
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + math.floor(a._1 * a._2 * S + 0.5), b._2 + math.floor(a._2 * S + 0.5))
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Double, Double)): Double = b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
