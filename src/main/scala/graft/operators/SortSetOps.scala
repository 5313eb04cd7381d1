package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sort / limit / top-K-per-group and set operations (SURVEY §2.2).
  *
  * Scale posture: global `orderBy` in Spark is a range-partitioned sort
  * (sampled boundaries, fully distributed); `orderBy.limit(k)` plans as
  * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  * driver, no global sort at all. Top-K per group is the
  * row_number-then-filter pattern: one shuffle on the group key; the
  * rank filter is applied streaming within each sorted partition.
  */
object SortSetOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // multi-key global sort, mixed direction, with limit (TakeOrdered).
    "sort_multi_key" -> { (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_extendedprice"))
        .orderBy(
          col("l_returnflag").desc,
          col("l_extendedprice").asc,
          col("l_orderkey").asc,
          col("l_linenumber").asc
        )
        .limit(100)
    },

    // top-3 orders by price within each priority class.
    "topk_per_group" -> { (spark, dir) =>
      val w = Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderpriority"),
          col("o_orderkey"),
          col("o_totalprice"),
          row_number().over(w).cast("long").as("rn")
        )
        .filter(col("rn") <= 3)
        .orderBy(col("o_orderpriority"), col("rn"))
    },

    // UNION ALL of two overlapping selections, then aggregate.
    "set_union_all" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val a = c.filter(col("c_nationkey") < 12).select(col("c_custkey"), col("c_mktsegment"))
      val b = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"), col("c_mktsegment"))
      a.union(b)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    },

    // INTERSECT (distinct) of the same two selections.
    "set_intersect" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val a = c.filter(col("c_nationkey") < 12).select(col("c_custkey"), col("c_mktsegment"))
      val b = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"), col("c_mktsegment"))
      a.intersect(b).orderBy(col("c_custkey"))
    },

    // EXCEPT (distinct).
    "set_except" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val a = c.filter(col("c_nationkey") < 12).select(col("c_custkey"), col("c_mktsegment"))
      val b = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"), col("c_mktsegment"))
      a.except(b).orderBy(col("c_custkey"))
    },

    // INTERSECT ALL: bag semantics — duplicates survive min(multiplicity).
    "set_intersect_all" -> { (spark, dir) =>
      val l = Tables.lineitem(spark, dir)
      val a = l.filter(col("l_quantity") > 40.0).select(col("l_orderkey"), col("l_returnflag"))
      val b = l.filter(col("l_discount") > 0.02).select(col("l_orderkey"), col("l_returnflag"))
      a.intersectAll(b)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // EXCEPT ALL: bag difference.
    "set_except_all" -> { (spark, dir) =>
      val l = Tables.lineitem(spark, dir)
      val a = l.filter(col("l_quantity") > 40.0).select(col("l_orderkey"), col("l_returnflag"))
      val b = l.filter(col("l_discount") > 0.02).select(col("l_orderkey"), col("l_returnflag"))
      a.exceptAll(b)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // unionByName with reordered/extra columns (allowMissingColumns).
    "set_union_by_name" -> { (spark, dir) =>
      val s = Tables
        .supplier(spark, dir)
        .select(col("s_name").as("name"), col("s_acctbal").as("bal"), col("s_nationkey").as("nk"))
      val c = Tables
        .customer(spark, dir)
        .filter(col("c_custkey") < 50)
        .select(col("c_nationkey").as("nk"), col("c_name").as("name"))
      s.unionByName(c, allowMissingColumns = true)
        .select(col("name"), col("nk"), col("bal"))
        .orderBy(col("name"))
    }
  )

  private val ab =
    """a AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_nationkey < 12),
      |b AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000.0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sort_multi_key" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
        |FROM lineitem
        |ORDER BY l_returnflag DESC, l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,
    "topk_per_group" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "set_union_all" ->
      s"""WITH $ab
         |SELECT c_mktsegment, COUNT(*) AS n
         |FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "set_intersect" ->
      s"""WITH $ab
         |SELECT * FROM a INTERSECT SELECT * FROM b ORDER BY c_custkey""".stripMargin,
    "set_except" ->
      s"""WITH $ab
         |SELECT * FROM a EXCEPT SELECT * FROM b ORDER BY c_custkey""".stripMargin,
    "set_intersect_all" ->
      """WITH a AS (SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity > 40.0),
        |     b AS (SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_discount > 0.02)
        |SELECT l_returnflag, COUNT(*) AS n
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_except_all" ->
      """WITH a AS (SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity > 40.0),
        |     b AS (SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_discount > 0.02)
        |SELECT l_returnflag, COUNT(*) AS n
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "set_union_by_name" ->
      """SELECT name, nk, bal FROM (
        |  SELECT s_name AS name, s_nationkey AS nk, s_acctbal AS bal FROM supplier
        |  UNION ALL
        |  SELECT c_name AS name, c_nationkey AS nk, NULL AS bal
        |  FROM customer WHERE c_custkey < 50
        |) ORDER BY name""".stripMargin
  )
}
