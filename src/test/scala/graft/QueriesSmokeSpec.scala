package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs on sf0.001 and returns rows; keys line up
  * with oracleSql. Deeper per-operator assertions live in their own specs;
  * exact-value checking is the driver's DuckDB gate (tools/check.py
  * locally).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
  }

  test("every query has an oracle — no unchecked queries") {
    // Approximate operators are hash-checked through declared bounds
    // (constant-TRUE oracles: sim_ann_ivf's recall bound,
    // agg_approx_distinct's ±5% bound), so EVERY query must carry one;
    // a new query can't silently ship with only the rows-only check.
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries with no oracle: $unchecked")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
