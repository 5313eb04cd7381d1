package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ShingleArray

/** Semantics pin for the native ShingleArray expression (r19): it must
  * reproduce the typed-flatMap shingler it replaced BYTE FOR BYTE —
  * including `String.split(' ')`'s trailing-empty-token removal (which
  * Spark's builtin `split(col, " ")` does NOT share: it keeps trailing
  * empties, which is exactly why the rewrite is a native expression and
  * not a builtin transform). The reference below is the r4–r18 closure
  * body verbatim.
  */
class ShingleArraySpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()

  /** The replaced closure, verbatim (TextOps.shingleRows r4–r18). */
  private def reference(text: String, k: Int): Seq[String] =
    if (text == null) Seq.empty
    else {
      val ws = text.split(' ')
      if (ws.length < k) Seq.empty
      else {
        val seen = new scala.collection.mutable.HashSet[String]
        Iterator.range(0, ws.length - k + 1).flatMap { i =>
          val sb = new java.lang.StringBuilder(ws(i))
          var j = 1
          while (j < k) { sb.append(' ').append(ws(i + j)); j += 1 }
          val s = sb.toString
          if (seen.add(s)) Iterator.single(s) else Iterator.empty
        }.toSeq
      }
    }

  private def viaExpression(text: String, k: Int): Seq[String] = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
      .select(ShingleArray.column(col("text"), k).as("sh"))
      .collect()(0) match {
      case r if r.isNullAt(0) => Seq.empty
      case r                  => r.getSeq[String](0)
    }
  }

  // The corner cases that separate String.split(' ') from the builtin
  // split: trailing/leading/interior spaces, empty and all-space texts.
  private val corners = Seq(
    "a b c d",            // plain
    "a b c d ",           // one trailing space (trailing empty dropped)
    "a b c d   ",         // many trailing spaces
    " a b c",             // leading empty token KEPT
    "a  b c",             // interior empty token KEPT
    "a b  ",              // trailing spaces after short text
    "",                   // empty string: split → [""], < k tokens
    "   ",                // all spaces: split → [], < k tokens
    "a b",                // exactly k-1 tokens at k=3
    "a b c",              // exactly k tokens
    "x x x x x x",        // duplicate shingles collapse, first-occurrence order
    "a b c a b c a b c",  // repeated phrase
    "α β γ δ ε",          // non-ASCII
    null                  // null text → no rows
  )

  test("expression ≡ replaced closure on every corner case, k ∈ {2,3,8}") {
    for (k <- Seq(2, 3, 8); t <- corners) {
      assert(
        viaExpression(t, k) === reference(t, k),
        s"k=$k text=${Option(t).map("'" + _ + "'").getOrElse("null")}")
    }
  }

  test("expression ≡ replaced closure over the sf0.001 fixture corpus, row-identical") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (k <- Seq(3, 8)) {
      val expected = docs.flatMap { case (id, t) => reference(t, k).map(s => (id, s)) }.toSet
      val got = operatorsShingleRows(dir, k)
      assert(got === expected, s"k=$k")
    }
  }

  /** The production path (TextOps.shingleRows) via its package-private
    * accessor, collected as a set of (doc_id, shingle) rows. */
  private def operatorsShingleRows(dir: String, k: Int): Set[(Long, String)] =
    graft.operators.TextOpsTestBridge
      .shingleRows(Tables.documents(spark, dir), k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSet

  test("whole-stage codegen spans the shingle stage (no Deserialize/MapElements)") {
    val plan = graft.operators.TextOpsTestBridge
      .shingleRows(Tables.documents(spark, "/root/testdata/sf0.001"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"), plan)
    assert(!plan.contains("MapElements"), plan)
    assert(!plan.contains("SerializeFromObject"), plan)
    assert(plan.contains("graft_shingle_array"), plan)
  }
}
