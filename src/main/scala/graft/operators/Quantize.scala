package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 embedding quantization — the storage step
  * an embedding pipeline runs before landing vectors at 100 TB scale:
  * 8× smaller payloads (1 byte/dim + one f64 scale vs 8 bytes/dim) at a
  * bounded reconstruction error of scale/2 per element.
  *
  * scale = max|x| / 127; code c = round(x / scale) ∈ [−127, 127]
  * (tinyint); dequantized x̂ = c · scale. The all-zero vector gets
  * scale 0 and all-zero codes (exact). Everything is codegen'd
  * built-ins — `transform` / `array_max` / `zip_with` — no UDFs, so
  * quantization runs inside whole-stage codegen at the scan.
  *
  * The reconstruction bound |x − x̂| ≤ scale/2 is exact in real
  * arithmetic; QuantizeSpec pins it (with float-noise headroom) and the
  * embed_quantize query gates it per label against the oracle.
  */
object Quantize {

  /** Per-vector symmetric scale: max|x| / 127. */
  def scaleOf(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** int8 codes for `v` under `scale` (array<tinyint>; all zeros when
    * scale is 0 — the zero vector). */
  def codes(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0.0)).otherwise(round(x / scale)).cast("tinyint"))

  /** Reconstruct doubles from codes + scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, c => c.cast("double") * scale)

  /** Attach `scaleCol` + `codesCol` for the vector column `vCol`. */
  def withQuantized(
      df: DataFrame,
      vCol: String,
      codesCol: String = "q",
      scaleCol: String = "q_scale"
  ): DataFrame = {
    val withScale = df.withColumn(scaleCol, scaleOf(col(vCol)))
    withScale.withColumn(codesCol, codes(col(vCol), col(scaleCol)))
  }

  /** Per-element max reconstruction error of a quantized vector. */
  def maxAbsError(v: Column, q: Column, scale: Column): Column =
    array_max(zip_with(v, dequantize(q, scale), (a, b) => abs(a - b)))
}
