package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a PRE-BUILT Bloom filter — the
  * filter object rides along as a codegen reference (serialized once
  * into the task binary, which Spark broadcasts), so the probe is a
  * direct `mightContainLong`/`mightContainBinary` call inside
  * whole-stage codegen: no UDF boxing, no per-row closure dispatch.
  *
  * Key-type contract mirrors how `DataFrameStatFunctions.bloomFilter`
  * PUTS items — longs via putLong, strings via the UTF-8 bytes of
  * putString — so a filter built there probes consistently here.
  * False positives pass (the caller's exact join removes them); false
  * negatives cannot occur, which is what makes Bloom PRUNING exact.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects bigint or string (cast integral keys to long), got ${t.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: Long        => bloom.mightContainLong(l)
    case s: UTF8String  => bloom.mightContainBinary(s.getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType => defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
      case _        => defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
