package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** MULTI-PROBE sign-LSH keys for the QUERY side of ANN search (Lv et
  * al., "Multi-Probe LSH", VLDB 2007, applied to sign-random-projection
  * bands): for each band, the base key PLUS `extraProbes` perturbed keys
  * — the base with its 1st, 2nd, … lowest-|margin| bit flipped, where a
  * bit's margin is |v·h| for its hyperplane. A near neighbor that missed
  * the base bucket most likely differs in exactly the bit whose
  * projection sat closest to the hyperplane, so probing those buckets
  * buys recall at FIXED band count — the standard scale trade, since
  * extra bands cost index memory and shuffle volume on the CORPUS side
  * (n·b rows) while extra probes cost only probe-side rows (q·b·(1+T),
  * broadcast anyway).
  *
  * Output layout: array<long> of length bands·(1+extraProbes), entry
  * e = band·(1+extraProbes)+p — position recovers the band index after
  * posexplode. Probe keys are distinct by construction (each flips a
  * different bit of the same base). Same plane family as [[SignBandKeys]]
  * (pure function of seed/bands/bits/dim), so probe keys meet the corpus
  * keys exactly. Query-side only and q is small, so this is a
  * CodegenFallback — the corpus side stays on the codegen'd
  * [[SignBandKeys]] hot path.
  */
case class SignBandProbes(
    child: Expression,
    bitsPerBand: Int,
    bands: Int,
    seed: Long,
    dim: Int = SignBandKeys.DefaultDim,
    extraProbes: Int = 2
) extends UnaryExpression with CodegenFallback {

  require(extraProbes >= 0 && extraProbes <= bitsPerBand,
    s"extraProbes must be in [0, bitsPerBand=$bitsPerBand], got $extraProbes " +
      "(each probe flips a distinct bit of one band's key)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_sign_band_probes"

  @transient private lazy val planes: Array[Array[Double]] =
    SignBandKeys.planes(seed, bands * bitsPerBand, dim)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    SignBandKeys.requireDim(v.numElements(), dim)
    val perBand = 1 + extraProbes
    val keys = new Array[Long](bands * perBand)
    val dots = new Array[Double](bitsPerBand)
    var b = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < bitsPerBand) {
        val p = planes(b * bitsPerBand + i)
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += v.getDouble(d) * p(d); d += 1 }
        if (dot > 0) key |= (1L << i)
        dots(i) = math.abs(dot)
        i += 1
      }
      keys(b * perBand) = key
      // flip the extraProbes lowest-|margin| bits, one per probe key
      val order = (0 until bitsPerBand).sortBy(i => dots(i))
      var t = 0
      while (t < extraProbes) {
        keys(b * perBand + 1 + t) = key ^ (1L << order(t))
        t += 1
      }
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBandProbes {
  /** Column-API entry point; requires GraftExtensions registration on
    * the session. */
  def keysColumn(
      v: Column,
      bitsPerBand: Int,
      bands: Int,
      seed: Long,
      extraProbes: Int,
      dim: Int = SignBandKeys.DefaultDim
  ): Column =
    call_function("graft_sign_band_probes",
      v, lit(bitsPerBand), lit(bands), lit(seed), lit(dim), lit(extraProbes))
}
