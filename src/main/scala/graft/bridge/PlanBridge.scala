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

  /** FULLY-CONVERTED catalyst tree of a Column. [[expression]] can return
    * an opaque `ColumnNodeExpression` leaf wrapping the Spark-4 column-
    * node tree (so catalyst traversals see nothing inside); this runs the
    * session-independent node→expression converter first — use it when
    * the CONTENTS (attributes, literals) must be inspected. */
  def catalystExpression(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
