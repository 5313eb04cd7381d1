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

  test("streaming quarantine sink: one exactly-once partitioned sink, dead-letter prunable") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("quarantine_sink").toString
    val in = MemoryStream[(Long, Double, String)]
    in.addData((1L, 10.0, "F"), (2L, -5.0, "O"), (3L, 3.0, "X"), (4L, -1.0, "Z"))
    val q = graft.streaming.StreamSinks.quarantineSink(
      in.toDF().toDF("k", "price", "st"), rules,
      s"$dir/out", s"$dir/ckpt")
    q.awaitTermination()
    // second batch through the SAME checkpoint: appends exactly once
    val q2 = graft.streaming.StreamSinks.quarantineSink(
      in.toDF().toDF("k", "price", "st"), rules,
      s"$dir/out", s"$dir/ckpt")
    in.addData((5L, 0.0, "P"), (6L, 6.0, "O"))
    q2.awaitTermination()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === 6)
    // partition values read back as strings (no boolean partition-type inference)
    val clean = out.filter(col("is_quarantined") === "false")
    assert(clean.select("k").collect().map(_.getLong(0)).toSet === Set(1L, 6L))
    assert(clean.select("violation_reasons").collect().forall(_.getString(0) == ""))
    val dead = out.filter(col("is_quarantined") === "true")
      .select(col("k"), col("violation_reasons")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dead === Map(
      2L -> "nonpositive_price",
      3L -> "invalid_status",
      4L -> "nonpositive_price+invalid_status",
      5L -> "nonpositive_price"))
    // the clean-side read is partition-PRUNED, not filtered: the
    // is_quarantined predicate reaches the scan as a PartitionFilter
    val scanMeta = clean.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc.metadata
    }.head
    assert(scanMeta("PartitionFilters").contains("is_quarantined"),
      s"partition filter not pushed to the scan: $scanMeta")
  }
}
