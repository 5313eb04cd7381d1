package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** FileIO.writeSorted — range-clustered, within-partition-sorted layout.
  * The pruning claim is measured, not asserted by vibes: the same
  * selective range filter over the SAME data must emit far fewer rows
  * from the scan operator on the sorted layout (row-group min/max stats
  * skip non-overlapping groups; Spark re-applies the filter on top, so
  * results stay identical) than on a value-shuffled layout where every
  * row group's range overlaps every predicate.
  */
class SortedLayoutSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // drive THIS queryExecution so metrics populate
    graft.tools.PlanProbe
      .collectAll(df.queryExecution.executedPlan) { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value)
      .sum
  }

  test("writeSorted: row-group stats prune a selective range scan; results identical") {
    val li = Tables
      .lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("l_shipdate"), col("l_quantity"))
    val total = li.count()

    val sortedPath = "/root/repo/tmp/graft_io/sorted_layout"
    val shuffledPath = "/root/repo/tmp/graft_io/shuffled_layout"
    sources.FileIO.writeSorted(li, sortedPath, Seq("l_shipdate"), files = 8)
    // adversarial baseline: same data, same file count, values scattered
    li.repartition(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(shuffledPath)

    def filtered(path: String) = spark.read
      .parquet(path)
      .filter(col("l_shipdate").between("1995-06-01", "1995-06-30"))

    val expected = li
      .filter(col("l_shipdate").between("1995-06-01", "1995-06-30"))
      .select(col("l_orderkey"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val gotSorted = filtered(sortedPath)
      .select(col("l_orderkey"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(gotSorted === expected, "sorted layout changed query results")

    val rowsSorted = scanOutputRows(filtered(sortedPath))
    val rowsShuffled = scanOutputRows(filtered(shuffledPath))
    // shuffled: every row group overlaps the month → scan emits ~all rows
    // (record-level parquet filtering is off by default in Spark).
    // sorted: only the file(s) whose range covers June '95 survive.
    assert(rowsShuffled > total / 2, s"baseline unexpectedly pruned: $rowsShuffled of $total")
    assert(
      rowsSorted * 4 < rowsShuffled,
      s"sorted layout did not prune: scan emitted $rowsSorted vs baseline $rowsShuffled")
  }
}
