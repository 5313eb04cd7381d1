package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property basis of the whole oracle strategy (graft.util.Exact and the
  * similarity quantization): a sum of floor-quantized doubles is EXACTLY
  * order-independent as long as every intermediate stays below 2^53 —
  * this is what lets Spark's nondeterministic partial-aggregation order
  * hash-match a single-threaded oracle. Checked over random magnitudes
  * and shuffles with ScalaCheck.
  */
class ExactPropertySpec extends AnyFunSuite {
  private val Scale = 10000.0

  private def qsum(xs: Seq[Double]): Double =
    xs.map(x => math.floor(x * Scale + 0.5)).sum / Scale

  test("quantized sums are order-independent for money-scale magnitudes") {
    val gen = for {
      xs <- Gen.listOfN(200, Gen.chooseNum(-1e8, 1e8))
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (xs, seed)
    val prop = Prop.forAll(gen) { case (xs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      // bitwise equality, not approximate
      java.lang.Double.doubleToRawLongBits(qsum(xs)) ==
        java.lang.Double.doubleToRawLongBits(qsum(shuffled))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("quantized sums match tree-reduction (Spark's partial/final merge shape)") {
    val gen = Gen.listOfN(128, Gen.chooseNum(-1e6, 1e6))
    val prop = Prop.forAll(gen) { xs =>
      val seq = xs.map(x => math.floor(x * Scale + 0.5)).sum
      // partial sums per 'partition', then merged — the 2-phase agg path
      val tree = xs.grouped(16).map(_.map(x => math.floor(x * Scale + 0.5)).sum).sum
      seq == tree
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
