package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Profiling

/** The DQ enforcement split (`Profiling.quarantineSplit`): the two sides
  * must be a disjoint partition of the input, and the `violations` tag
  * must list failed rule names in RULE order (pipelines key dead-letter
  * routing off that string, so order is contract, not cosmetics). */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, 10.0, "F"),  // valid
      (2L, -5.0, "O"),  // price rule fails
      (3L, 3.0, "X"),   // status rule fails
      (4L, -1.0, "Z"),  // both fail
      (5L, 0.0, "P")    // price rule fails (non-positive boundary)
    ).toDF("k", "price", "st")
  }

  private val rules = Seq(
    "nonpositive_price" -> (col("price") > 0),
    "invalid_status" -> col("st").isin("F", "O", "P"))

  test("split is a disjoint partition of the input") {
    val df = fixture
    val (valid, quarantined) = Profiling.quarantineSplit(df, rules)
    assert(valid.count() + quarantined.count() === df.count())
    // Disjoint by key, and valid side carries no violations column.
    val vk = valid.select("k").collect().map(_.getLong(0)).toSet
    val qk = quarantined.select("k").collect().map(_.getLong(0)).toSet
    assert(vk.intersect(qk).isEmpty)
    assert(vk === Set(1L))
    assert(!valid.columns.contains("violations"))
  }

  test("violations list failed rules in rule order") {
    val (_, quarantined) = Profiling.quarantineSplit(fixture, rules)
    val reasons = quarantined
      .select(col("k"), concat_ws("+", col("violations")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reasons === Map(
      2L -> "nonpositive_price",
      3L -> "invalid_status",
      4L -> "nonpositive_price+invalid_status",
      5L -> "nonpositive_price"))
  }

  test("all-valid and all-invalid edges") {
    import spark.implicits._
    val allValid = Seq((1L, 1.0, "F"), (2L, 2.0, "O")).toDF("k", "price", "st")
    val (v1, q1) = Profiling.quarantineSplit(allValid, rules)
    assert(v1.count() === 2 && q1.count() === 0)
    val allBad = Seq((1L, -1.0, "Z")).toDF("k", "price", "st")
    val (v2, q2) = Profiling.quarantineSplit(allBad, rules)
    assert(v2.count() === 0 && q2.count() === 1)
  }
}
