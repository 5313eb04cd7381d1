package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.sql.{Column, functions => F}

/** Native Catalyst expression for PQ ASYMMETRIC DISTANCE COMPUTATION
  * (the candidate-scoring inner loop of [[graft.operators.IvfPq]]):
  * given a vector's PQ `codes` (array<int>, one code per subspace) and
  * the query's per-cluster ADC distance `table`
  * (array<array<double>>, table[sub][code] = ‖q_residual_sub −
  * codeword‖²), the approximate distance is Σ_sub table[sub][codes[sub]]
  * — m array lookups and adds per candidate row.
  *
  * This replaces the one Scala UDF the engine had left on a hot path
  * (r15 verdict low-item 3): the UDF deserialized the codes Seq and
  * boxed a broadcast map lookup per candidate row AND blocked
  * whole-stage codegen for the candidate stage; this expression runs
  * fused inside the same codegen span as the broadcast probe join that
  * supplies the table column. The distance table rides IN the broadcast
  * probe frame (|q|·nProbe rows of m·nCodes doubles — the codebook
  * metadata class), so no driver-side map or extra broadcast exists at
  * all. The CosineSimilarity/BloomMightContain precedent, applied to PQ
  * search.
  *
  * Null/shape semantics (CosineSimilarity's discipline): a null input,
  * null element, subspace-count mismatch, or out-of-range code yields
  * NULL, never a garbage distance — malformed codes surface as missing
  * candidates, visibly.
  */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okCodes = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    val okTable = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _                                      => false
    }
    if (okCodes && okTable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<int>, array<array<double>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m != table.numElements()) return null
    var s = 0.0
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub) || table.isNullAt(sub)) return null
      val row = table.getArray(sub)
      val code = codes.getInt(sub)
      if (code < 0 || code >= row.numElements() || row.isNullAt(code)) return null
      s += row.getDouble(code)
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val m = ctx.freshName("m")
      val sub = ctx.freshName("sub")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val code = ctx.freshName("code")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $c.numElements();
         |boolean $bad = ($m != $t.numElements());
         |double $s = 0.0;
         |for (int $sub = 0; !$bad && $sub < $m; $sub++) {
         |  if ($c.isNullAt($sub) || $t.isNullAt($sub)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $t.getArray($sub);
         |  int $code = $c.getInt($sub);
         |  if ($code < 0 || $code >= $row.numElements() || $row.isNullAt($code)) {
         |    $bad = true; break;
         |  }
         |  $s += $row.getDouble($code);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcDistance {
  /** Column-API entry point; requires GraftExtensions registration. */
  def column(codes: Column, table: Column): Column =
    F.call_function("graft_adc_distance", codes, table)
}
