package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalable as-of join: for each left row, attach the payload of the
  * latest right row with the same key and `rightTime <= leftTime`
  * (inclusive).
  *
  * Implementation is the union-and-window formulation, the shape that
  * survives 100 TB: tag both inputs, union them, and run one window per
  * key ordered by (time, side) carrying the last non-null right payload
  * forward. Cost = exactly ONE shuffle (hash partition by key) + one sort
  * within partitions — no range-condition join, no broadcast-nested-loop
  * explosion, no per-row subquery. Skewed keys can be salted upstream.
  *
  * Right rows must be unique per (key, time) for deterministic payloads —
  * pre-aggregate the right side if needed.
  */
object AsOfJoin {
  def asOf(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    val pfx = "__asof_r_"
    val l2 = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r2 = right.select(
      (Seq(
        col(rightKey).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side")
      ) ++ rightPayload.map(p => col(p).as(pfx + p))): _*
    )
    // Right rows sort before left rows at equal time, so an exact
    // timestamp match is visible to the left row (>= semantics).
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(l2.unionByName(r2, allowMissingColumns = true)) {
      (df, p) => df.withColumn(pfx + p, last(col(pfx + p), ignoreNulls = true).over(w))
    }
    val out = filled.filter(col("__side") === 1).drop("__k", "__t", "__side")
    rightPayload.foldLeft(out)((df, p) => df.withColumnRenamed(pfx + p, p))
  }

  /** Forward as-of: attach the payload of the EARLIEST right row with the
    * same key and `rightTime >= leftTime`. Same single-shuffle
    * union-and-window shape, with the window scanning forward (first
    * non-null right payload at-or-after the left row). LEFT rows sort
    * before right rows at equal time (__side: left=0 < right=1), so the
    * forward frame (currentRow..unboundedFollowing) still CONTAINS the
    * equal-timestamp right row — that is how the >= tie rule holds,
    * mirroring asOf's inclusive semantics from the other direction.
    */
  def asOfForward(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    val pfx = "__asof_r_"
    val l2 = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
    val r2 = right.select(
      (Seq(
        col(rightKey).as("__k"),
        col(rightTime).as("__t"),
        lit(1).as("__side")
      ) ++ rightPayload.map(p => col(p).as(pfx + p))): _*
    )
    // Left rows sort before right rows at equal time, and the frame looks
    // FORWARD: first right payload at-or-after the left row.
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = rightPayload.foldLeft(l2.unionByName(r2, allowMissingColumns = true)) {
      (df, p) => df.withColumn(pfx + p, first(col(pfx + p), ignoreNulls = true).over(w))
    }
    val out = filled.filter(col("__side") === 0).drop("__k", "__t", "__side")
    rightPayload.foldLeft(out)((df, p) => df.withColumnRenamed(pfx + p, p))
  }

  /** SQL surface:
    * graft_asof_join(leftTable, leftKey, leftTime, rightTable, rightKey,
    * rightTime, payloadCols, direction) — payloadCols is a
    * comma-separated list of right-side columns to attach; direction is
    * 'backward' (latest right at-or-before, the default ASOF semantics)
    * or 'forward' (earliest right at-or-after). Lowers to the exact same
    * single-shuffle union-and-window plan as the Scala API. */
  private[graft] def sqlTableFunction(
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(
      args.length == 8,
      "graft_asof_join expects (leftTable, leftKey, leftTime, rightTable, rightKey, " +
        s"rightTime, payloadCols, direction), got ${args.length} arguments")
    def str(i: Int, what: String): String = args(i) match {
      case e if e.foldable =>
        e.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other =>
            throw new IllegalArgumentException(s"graft_asof_join: $what must be a string literal, got $other")
        }
      case other =>
        throw new IllegalArgumentException(s"graft_asof_join: $what must be a literal, got $other")
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val left = spark.table(str(0, "leftTable"))
    val right = spark.table(str(3, "rightTable"))
    val payload = str(6, "payloadCols").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(payload.nonEmpty, "graft_asof_join: payloadCols must name at least one right column")
    payload.foreach { p =>
      require(
        !left.columns.contains(p),
        s"graft_asof_join: payload column '$p' collides with a left-side column — alias it on the right table first")
    }
    val joined = str(7, "direction") match {
      case "backward" => asOf(left, str(1, "leftKey"), str(2, "leftTime"), right, str(4, "rightKey"), str(5, "rightTime"), payload)
      case "forward"  => asOfForward(left, str(1, "leftKey"), str(2, "leftTime"), right, str(4, "rightKey"), str(5, "rightTime"), payload)
      case other =>
        throw new IllegalArgumentException(s"graft_asof_join: direction must be 'backward' or 'forward', got '$other'")
    }
    joined.queryExecution.analyzed
  }
}
