package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Window-function surface (SURVEY §2.2 "Window functions").
  *
  * Scale posture: every window here is partitioned by a key (one shuffle,
  * sort within partitions — same cost class as a groupBy). The single
  * global window (ntile over all customers) is flagged as the one shape
  * that does NOT scale: it forces a single partition and exists only to
  * cover the operator; at 100 TB you'd ntile within partitions or use
  * approx percentiles.
  *
  * Determinism: every ORDER BY inside an OVER ends with a unique key so
  * row_number/lag/lead are reproducible and oracle-checkable.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  /** Exact running sum of a double column over a window frame: quantize
    * per row in IEEE double (see graft.util.Exact), sum of integral
    * doubles is exact regardless of the engine's frame algorithm
    * (Spark accumulates, DuckDB uses a segment tree — results only agree
    * because every partial is integral).
    */
  private def wsum(c: org.apache.spark.sql.Column, w: org.apache.spark.sql.expressions.WindowSpec) =
    sum(floor(c * lit(10000.0) + lit(0.5))).over(w) / lit(10000.0)

  val queries: Map[String, Q] = Map(
    // ranking trio per nation: top-3 customers by balance.
    "win_rank_top3" -> { (spark, dir) =>
      val w = Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables
        .customer(spark, dir)
        .select(
          col("c_nationkey"),
          col("c_custkey"),
          col("c_acctbal"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk")
        )
        .filter(col("rn") <= 3)
        .orderBy(col("c_nationkey"), col("rn"))
    },

    // lag/lead across a customer's order history.
    "win_lag_lead" -> { (spark, dir) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price")
        )
        .orderBy(col("o_orderkey"))
    },

    // frame aggregates: running sum + 3-row moving average.
    // Distribution functions: percent_rank = (rank−1)/(n−1) and
    // cume_dist = |rows ≤ current|/n — both engines divide the same small
    // integers in IEEE double, so values are bit-exact; the ORDER BY is a
    // total order (acctbal, custkey) so ranks are unambiguous.
    "win_dist" -> { (spark, dir) =>
      val w = Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables
        .customer(spark, dir)
        .select(
          col("c_nationkey"),
          col("c_custkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd")
        )
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },

    "win_running" -> { (spark, dir) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = w.rowsBetween(-2, Window.currentRow)
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          wsum(col("o_totalprice"), run).as("running_sum"),
          (wsum(col("o_totalprice"), mov) / count(lit(1)).over(mov)).as("moving_avg")
        )
        .orderBy(col("o_orderkey"))
    },

    // ntile quartiles — DISTRIBUTED two-pass plan (DistributedRank): the
    // naive Window.orderBy-with-no-partition formulation funnels the
    // whole table through one task; this one range-partitions, ranks
    // locally, and reassembles global rank from metadata-scale offsets.
    // Oracle stays plain NTILE(4): the piecewise front-loaded-remainder
    // formula matches SQL NTILE for every N, divisible by 4 or not.
    "win_ntile" -> { (spark, dir) =>
      DistributedRank
        .withGlobalNtile(
          Tables.customer(spark, dir),
          buckets = 4,
          sortExprs = Seq(col("c_acctbal").asc, col("c_custkey").asc),
          ntileCol = "quartile"
        )
        .select(col("c_custkey"), col("quartile"))
        .orderBy(col("c_custkey"))
    },

    // RANGE-based frame (value-range, not row-count): per customer, how
    // many of their orders fall within 10k price below the current one,
    // and the quantized sum over that value window. Completes the frame
    // family next to win_running's ROWS frames.
    "win_range_frame" -> { (spark, dir) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000L, Window.currentRow)
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice"),
          count(lit(1)).over(w).as("n_in_band"),
          wsum(col("o_totalprice"), w).as("sum_in_band")
        )
        .orderBy(col("o_orderkey"))
    },

    // TIME-interval RANGE frame: per user, the trailing-1-hour (inclusive)
    // event count and quantized value sum. Spark range frames need a
    // numeric sort key, so the frame runs over epoch MICROSECONDS
    // (`unix_micros`) — integer-exact, and the same key DuckDB's
    // `epoch_us` yields, so frame membership is bit-identical. The value
    // sum rides the 1e-3 grid (sum of longs in a frame is
    // order-independent). One shuffle on user_id.
    "win_time_range" -> { (spark, dir) =>
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      Tables
        .events(spark, dir)
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") * 1000 + lit(0.5)).cast("long").as("v_q"))
        .select(
          col("event_id"),
          col("user_id"),
          count(lit(1)).over(w).as("n_trailing_1h"),
          sum(col("v_q")).over(w).as("sum_q_trailing_1h"))
        .orderBy(col("event_id"))
    },

    // first/last over the full partition frame.
    "win_first_last" -> { (spark, dir) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables
        .orders(spark, dir)
        .select(
          col("o_custkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order")
        )
        .distinct()
        .orderBy(col("o_custkey"))
    }
  )

  private val over = "PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC"

  val oracles: Map[String, String] = Map(
    "win_rank_top3" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |    CAST(RANK() OVER w AS BIGINT) AS rnk,
        |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        |) WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,
    "win_lag_lead" ->
      s"""SELECT o_orderkey, o_custkey,
         |  LAG(o_totalprice, 1) OVER ($over) AS prev_price,
         |  LEAD(o_totalprice, 1) OVER ($over) AS next_price
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_dist" ->
      """SELECT c_nationkey, c_custkey,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "win_running" ->
      s"""SELECT o_orderkey, o_custkey,
         |  (SUM(FLOOR(o_totalprice * 10000.0 + 0.5))
         |     OVER ($over ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0) AS running_sum,
         |  ((SUM(FLOOR(o_totalprice * 10000.0 + 0.5))
         |     OVER ($over ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 10000.0)
         |   / COUNT(*) OVER ($over ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS moving_avg
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_ntile" ->
      """SELECT c_custkey,
        |  CAST(NTILE(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS BIGINT) AS quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "win_range_frame" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  COUNT(*) OVER w AS n_in_band,
        |  (SUM(FLOOR(o_totalprice * 10000.0 + 0.5)) OVER w / 10000.0) AS sum_in_band
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "win_time_range" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_q
        |  FROM events)
        |SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_trailing_1h,
        |  CAST(SUM(v_q) OVER w AS BIGINT) AS sum_q_trailing_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_first_last" ->
      s"""SELECT DISTINCT o_custkey,
         |  FIRST_VALUE(o_orderkey) OVER ($over
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
         |  LAST_VALUE(o_orderkey) OVER ($over
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
         |FROM orders ORDER BY o_custkey""".stripMargin
  )
}
