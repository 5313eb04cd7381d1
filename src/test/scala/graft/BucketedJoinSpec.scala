package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.sources.FileIO

/** The bucketed co-located join (`FileIO.writeBucketedTable`): a
  * sort-merge join between two tables bucketed into the same count on
  * the join key must plan with ZERO shuffle exchanges below the join —
  * the write-time shuffle is the whole price — while the same join over
  * bare parquet pays two per-query exchanges. Values identical. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bucketed SMJ plans with zero exchanges below the join; plain parquet pays two") {
    FileIO.writeBucketedTable(
      Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
      "graft_spec_bkt_orders", "o_custkey", 8)
    FileIO.writeBucketedTable(
      Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
      "graft_spec_bkt_customer", "c_custkey", 8)

    val bucketed = spark
      .table("graft_spec_bkt_orders")
      .hint("merge")
      .join(spark.table("graft_spec_bkt_customer"), col("o_custkey") === col("c_custkey"))
    val plain = Tables
      .orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .hint("merge")
      .join(
        Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))

    // collect across AQE boundaries (the PlanAuditSpec recursion)
    def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
        pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case q: QueryStageExec        => q.plan
      }
      p.collect(pf) ++ nested.flatMap(collectAll(_)(pf))
    }
    def joinSubtreeExchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // materialize so AQE finalizes the stages
      val smjs = collectAll(df.queryExecution.executedPlan) { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected a sort-merge join in the plan")
      smjs.flatMap(j => collectAll(j) { case e: ShuffleExchangeExec => e }).size
    }
    assert(joinSubtreeExchanges(bucketed) === 0,
      "bucketed join must read bucket i against bucket i with no exchange")
    assert(joinSubtreeExchanges(plain) === 2,
      "the un-bucketed control should shuffle both sides (else the comparison is vacuous)")

    // identical values through both layouts
    def vals(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vals(bucketed) === vals(plain))
    assert(vals(bucketed).values.sum > 0)
  }
}
