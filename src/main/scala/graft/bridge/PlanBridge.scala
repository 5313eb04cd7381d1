package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Wrap a constructed LogicalPlan (e.g. a graft.plans.SimilarityJoin
  * node) in a DataFrame — the one internal seam a custom logical operator
  * needs (Spark's own `Dataset.ofRows` is `private[sql]`, so this bridge
  * lives under the org.apache.spark.sql namespace; extension libraries
  * that add logical nodes — Delta, Iceberg, Sedona — cross the same seam
  * the same way). */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )

  /** Wrap a catalyst Expression in a user-facing Column — needed for
    * expressions carrying runtime objects (e.g. a built BloomFilter)
    * that cannot travel through the string-keyed function registry. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Inverse of [[column]]: the catalyst Expression behind a Column
    * (Spark 4 removed the public `.expr` accessor). */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Drop the PRESERVED origin statistics from a checkpointed frame's
    * LogicalRDD, keeping its partitioning/ordering and the checkpointed
    * RDD itself. Spark 4's `Dataset.(local)checkpoint` carries the
    * source plan's estimated `Statistics` across the checkpoint
    * (`LogicalRDD.rewriteStatsAndConstraints`); in an ITERATIVE operator
    * that checkpoints every round, the next round's size estimate is a
    * PRODUCT over the previous round's preserved estimate — join
    * estimation multiplies child sizeInBytes — so the BigInt's bit
    * length compounds geometrically with the round number, and by round
    * ~10 the driver spends SECONDS PER ROUND in BigInteger
    * multiplication inside the stats visitor (measured r18: an
    * 81 s dedup_semantic_incr whose jobs totalled 4 s — the stack was
    * Toom-Cook-3 multiplies under SizeInBytesOnlyStatsPlanVisitor).
    * Resetting to None makes the LogicalRDD report the conservative
    * `defaultSizeInBytes` like a pre-stats-preservation checkpoint, so
    * every round starts from a constant-size estimate. Loop ONLY — a
    * one-shot checkpoint keeps its preserved stats, which are better. */
  def dropOriginStats(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        ofRows(
          df.sparkSession,
          new LogicalRDD(
            l.output, l.rdd, l.outputPartitioning, l.outputOrdering, l.isStreaming, l.stream)(
            df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
            None,
            None))
      case _ => df
    }
  }

  /** FULLY-CONVERTED catalyst tree of a Column. [[expression]] can return
    * an opaque `ColumnNodeExpression` leaf wrapping the Spark-4 column-
    * node tree (so catalyst traversals see nothing inside); this runs the
    * session-independent node→expression converter first — use it when
    * the CONTENTS (attributes, literals) must be inspected. */
  def catalystExpression(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
