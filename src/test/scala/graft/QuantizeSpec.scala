package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quantize

/** int8 symmetric quantization: code range, zero-vector exactness, the
  * scale/2 reconstruction bound, and the 8× storage shape. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("codes are int8-ranged, bound holds, zero vector is exact") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 1.0)),            // symmetric range
      (2L, Seq(0.0, 0.0, 0.0, 0.0)),              // zero vector → scale 0
      (3L, Seq(1e-8, -1e-8, 5e-9, 0.0)),          // tiny magnitudes
      (4L, Seq(127.0, -126.5, 3.0, 64.249))       // large magnitudes
    ).toDF("id", "v")

    val q = Quantize.withQuantized(df, "v")
      .withColumn("err", Quantize.maxAbsError(col("v"), col("q"), col("q_scale")))
      .withColumn("cmax", array_max(transform(col("q"), c => abs(c.cast("int")))))
    val rows = q.select("id", "q_scale", "err", "cmax", "q").collect()

    rows.foreach { r =>
      val scale = r.getDouble(1); val err = r.getDouble(2); val cmax = r.getInt(3)
      assert(cmax <= 127, s"id=${r.getLong(0)}: code $cmax out of int8 range")
      assert(err <= scale / 2 * 1.000001 + 1e-12,
        s"id=${r.getLong(0)}: err $err exceeds scale/2 = ${scale / 2}")
    }
    val zero = rows.find(_.getLong(0) == 2L).get
    assert(zero.getDouble(1) === 0.0 && zero.getDouble(2) === 0.0)
    assert(zero.getSeq[Byte](4).forall(_ == 0), "zero vector must code to all zeros")

    // The max-magnitude element always codes to ±127 (scale definition).
    val big = rows.find(_.getLong(0) == 4L).get
    assert(big.getSeq[Byte](4).head === 127.toByte)
  }

  test("quantize→dequantize round trip preserves cosine structure") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0)),  // near 1
      (3L, Seq(0.0, 0.0, 1.0))   // orthogonal to 1
    ).toDF("id", "v")
    val deq = Quantize.withQuantized(df, "v")
      .withColumn("vq", Quantize.dequantize(col("q"), col("q_scale")))
      .select("id", "vq").as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    assert(cos(deq(1L), deq(2L)) > 0.95, "near-duplicate direction lost")
    assert(math.abs(cos(deq(1L), deq(3L))) < 0.05, "orthogonality lost")
  }
}
