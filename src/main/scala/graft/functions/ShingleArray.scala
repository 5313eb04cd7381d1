package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.Column
import org.apache.spark.unsafe.types.UTF8String

/** Distinct positional word k-gram shingles of a space-separated text,
  * as one native expression — the whole-stage-codegen replacement for
  * the typed `flatMap` that carried TextOps.shingleRows through rounds
  * 4–18 (the r18 verdict's top remaining §4 item: a typed closure in
  * the hottest per-byte path blocks codegen and inserts a full
  * row (de)serialization boundary around every shingle row).
  *
  * Semantics are PINNED to the closure it replaces (ShingleArraySpec):
  *   - tokenization is `String.split(' ')` — the Java/Scala char split,
  *     which KEEPS leading/interior empty tokens but DROPS trailing
  *     ones ("a  b " → ["a","","b"]); Spark's `split(col, " ")` keeps
  *     trailing empties, which is why this is not a builtin rewrite;
  *   - fewer than k tokens → empty array (explode emits nothing);
  *   - shingle i = tokens[i..i+k) joined by single spaces;
  *   - DISTINCT in first-occurrence order (the closure's HashSet walk).
  *
  * Both the interpreted and generated paths call the same static
  * [[ShingleArray.shingles]] — the generated code is one function call,
  * so codegen spans the stage while the per-doc loop stays a single
  * JIT-compiled method (the SignBandKeys recipe).
  */
case class ShingleArray(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_shingle_array"

  override def nullSafeEval(input: Any): Any =
    ShingleArray.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.ShingleArray.shingles($v, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {

  /** Called from both the interpreted and generated code paths. The body
    * is the shingleRows closure verbatim: char split, StringBuilder
    * k-gram join, HashSet first-occurrence distinct. */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    val ws = text.toString.split(' ')
    if (ws.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[UTF8String](ws.length - k + 1)
    var i = 0
    while (i <= ws.length - k) {
      val sb = new java.lang.StringBuilder(ws(i))
      var j = 1
      while (j < k) { sb.append(' ').append(ws(i + j)); j += 1 }
      val s = sb.toString
      if (seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point — k travels as a constructor literal, so no
    * registry registration is needed (the BloomMightContain seam). */
  def column(text: Column, k: Int): Column = {
    val bridge = org.apache.spark.sql.graftbridge.PlanBridge
    bridge.column(ShingleArray(bridge.expression(text), k))
  }
}
