package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Native sign-LSH signature: ALL `bands` band keys of a vector in one
  * fused pass — for each of bands×bitsPerBand fixed Gaussian hyperplanes,
  * the sign of v·h becomes one bit, bits pack into a long key per band.
  *
  * One expression instead of bands×bits composed cosine calls matters
  * twice at scale: the generated code is a small triple loop over a
  * REFERENCED plane matrix (the composed form emits one unrolled
  * 64-element loop per hyperplane — megabytes of Java that dominate
  * janino compile time and blow past JIT inlining limits), and each
  * vector element is read once per plane with zero intermediate arrays.
  *
  * The hyperplane family is a pure function of (seed, bands, bits, dim) —
  * identical across executors, plans, and runs, so LSH candidates are
  * deterministic and oracle-checkable. A vector whose length differs
  * from `dim` FAILS the row (clear error, same reject-don't-truncate
  * contract as CosineSimilarity): a silently truncated signature would
  * void the zero-false-negative guarantee for the dimensions it ignored.
  */
case class SignBandKeys(
    child: Expression,
    bitsPerBand: Int,
    bands: Int,
    seed: Long,
    dim: Int = SignBandKeys.DefaultDim
) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_sign_band_keys"

  @transient private lazy val planes: Array[Array[Double]] =
    SignBandKeys.planes(seed, bands * bitsPerBand, dim)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    SignBandKeys.requireDim(v.numElements(), dim)
    val keys = new Array[Long](bands)
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
        i += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val key = ctx.freshName("key")
      val pl = ctx.freshName("pl")
      s"""
         |graft.functions.SignBandKeys.requireDim($v.numElements(), $dim);
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $i = 0; $i < $bitsPerBand; $i++) {
         |    double[] $pl = $p[$b * $bitsPerBand + $i];
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) { $dot += $v.getDouble($d) * $pl[$d]; }
         |    if ($dot > 0) $key |= (1L << $i);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBandKeys {
  /** The engine-wide default embedding dimension (the fixtures' 64). */
  val DefaultDim = 64

  /** The engine-wide hyperplane family seed (shared by the Similarity
    * operators and the SimilarityJoin logical node, so their candidates
    * agree). */
  val DefaultSeed = 9001L

  /** Called from both the interpreted and generated code paths. */
  def requireDim(actual: Int, expected: Int): Unit =
    if (actual != expected)
      throw new IllegalArgumentException(
        s"graft_sign_band_keys: vector has $actual dimensions, the plane family has $expected — " +
          "a truncated signature would silently void the LSH zero-false-negative contract; " +
          "pass the corpus dimension to the operator instead")

  /** Deterministic Gaussian hyperplanes (seeded java.util.Random — the
    * nextGaussian algorithm is specified, so the family is identical on
    * every JVM). */
  def planes(seed: Long, n: Int, dim: Int = DefaultDim): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Column-API entry point; requires GraftExtensions registration on the
    * session (the function resolves by name at analysis time; the scalar
    * parameters travel as literal arguments). */
  def keysColumn(v: Column, bitsPerBand: Int, bands: Int, seed: Long, dim: Int = DefaultDim): Column =
    call_function("graft_sign_band_keys", v, lit(bitsPerBand), lit(bands), lit(seed), lit(dim))
}
