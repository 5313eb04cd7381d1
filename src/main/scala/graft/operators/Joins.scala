package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Join surface (SURVEY §2.2 "Joins").
  *
  * The reference delegates all joins to Hive over the tables its sink
  * lands (reference README.md:13,17); here they are Catalyst joins with
  * explicit scale posture per query:
  * - fact⋈fact → shuffle hash / sort-merge on the join key (AQE picks);
  * - fact⋈dim  → `broadcast()` the dim, zero shuffle on the fact;
  * - range/theta → banded equi-join (explode bounded candidate buckets),
  *   never a broadcast-nested-loop cross product;
  * - as-of     → union+window single-shuffle formulation (AsOfJoin).
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // TPC-H Q3-shaped: selective dim filter → two fact joins → agg → topN.
    "join_inner_topn" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(spark, dir)
      val l = Tables.lineitem(spark, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(o("o_orderkey"), o("o_orderdate"))
        .agg(dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // LEFT join with never-matched rows (parts with no lineitems).
    "join_left_nulls" -> { (spark, dir) =>
      val p = Tables.part(spark, dir)
      val l = Tables.lineitem(spark, dir)
      p.join(l, p("p_partkey") === l("l_partkey"), "left")
        .groupBy(p("p_partkey"))
        .agg(
          count(l("l_orderkey")).as("n_li"),
          coalesce(dsum(l("l_quantity")), lit(0.0)).as("sum_qty")
        )
        .orderBy(col("p_partkey"))
    },

    // RIGHT join: suppliers per nation, keeping supplier-less nations.
    "join_right" -> { (spark, dir) =>
      val s = Tables.supplier(spark, dir)
      val n = Tables.nation(spark, dir)
      s.join(n, s("s_nationkey") === n("n_nationkey"), "right")
        .groupBy(n("n_nationkey"), n("n_name"))
        .agg(count(s("s_suppkey")).as("n_supp"))
        .orderBy(col("n_nationkey"))
    },

    // FULL OUTER join of two aggregated sides.
    "join_full" -> { (spark, dir) =>
      val cc = Tables
        .customer(spark, dir)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val ss = Tables
        .supplier(spark, dir)
        .groupBy(col("s_nationkey").as("nk2"))
        .agg(count(lit(1)).as("n_supp"))
      cc.join(ss, cc("nk") === ss("nk2"), "full")
        .select(
          coalesce(cc("nk"), ss("nk2")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp")
        )
        .orderBy(col("nationkey"))
    },

    // LEFT SEMI (EXISTS): customers with at least one big order.
    "join_semi" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Bloom-PRUNED semi join (SkewTools.bloomSemiJoin): lineitems of
    // finished orders, but the big side is first filtered by a codegen'd
    // Bloom probe over the finished-order keys so its non-matching mass
    // never reaches the shuffle — exact semantics (the oracle is the
    // plain IN-subquery), approximate only in how much work is skipped.
    "join_bloom_semi" -> { (spark, dir) =>
      val dim = Tables
        .orders(spark, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      SkewTools
        .bloomSemiJoin(
          Tables.lineitem(spark, dir), "l_orderkey", dim, "o_orderkey",
          expectedKeys = dim.count())
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).cast("long").as("key_sum"))
        .orderBy(col("l_returnflag"))
    },

    // LEFT ANTI (NOT EXISTS): customers with no order above 300k.
    "join_anti" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // CROSS join of two tiny inputs (the only scale-sane cross join).
    "join_cross" -> { (spark, dir) =>
      val r = Tables.region(spark, dir).select(col("r_name"))
      val s = Tables.orders(spark, dir).select(col("o_orderstatus")).distinct()
      r.crossJoin(s).orderBy(col("r_name"), col("o_orderstatus"))
    },

    // Star join: two fact-side shuffles + broadcast dims → agg by region.
    "join_star_broadcast" -> { (spark, dir) =>
      val l = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      val n = Tables.nation(spark, dir)
      val r = Tables.region(spark, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name"))
        .agg(
          dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items")
        )
        .orderBy(col("r_name"))
    },

    // TPC-H Q3-shaped 4-table analytic: selective dim filter (segment) +
    // date predicates on BOTH fact sides of the join — the classic
    // "unshipped orders revenue" plan. Customer and nation are dims
    // (nation explicitly broadcast; customer small enough for AQE to
    // choose); orders⋈lineitem is the one unavoidable fact-fact shuffle.
    // Both date filters reach the parquet scans (PlanAuditSpec pins it).
    "analytics_q3" -> { (spark, dir) =>
      val cut = expr("TIMESTAMP '1998-06-01 00:00:00'")
      val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      val n = Tables.nation(spark, dir)
      val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
      val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cut)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), n("n_name"))
        .agg(dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // TPC-H Q5-shaped 6-table star: region→nation prune the customer AND
    // supplier sides (local-supplier condition c_nationkey = s_nationkey),
    // a one-year date window on orders, revenue per nation. This is the
    // multi-join ordering surface: Catalyst/AQE must sequence two dim
    // chains and two fact joins; dims are broadcast, facts shuffle once
    // each on their join keys.
    "analytics_q5" -> { (spark, dir) =>
      val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
      val n = Tables.nation(spark, dir)
      val c = Tables.customer(spark, dir)
      val s = Tables.supplier(spark, dir)
      val o = Tables
        .orders(spark, dir)
        .filter(
          col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
      val l = Tables.lineitem(spark, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(s, l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
        .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg(dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },

    // TPC-H Q10-shaped 4-table analytic: returned-item revenue per
    // customer over a one-quarter window, top 20. Group-by carries the
    // full customer display tuple (key + name + acctbal + nation), so the
    // aggregate key is wide — the shape that punishes engines that can't
    // push the date/returnflag filters below the joins.
    "analytics_q10" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val n = Tables.nation(spark, dir)
      val o = Tables
        .orders(spark, dir)
        .filter(
          col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1996-04-01 00:00:00'"))
      val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), c("c_acctbal"), n("n_name"))
        .agg(dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // TPC-H Q2-shaped CORRELATED SCALAR SUBQUERY (r13): for each part
    // (bounded id range), the supplier(s) charging the MINIMUM price for
    // that part. Written AS a correlated subquery in SQL text
    // deliberately: Spark cannot execute a per-row subquery, so the gate
    // proves Catalyst's decorrelation (RewriteCorrelatedScalarSubquery →
    // per-part MIN aggregate joined back on l_partkey — the plan a
    // hand-written groupBy+join would give). Prices quantized to cents
    // for cross-engine-exact hashing; DISTINCT because several line
    // items of one part can share supplier AND min price.
    "analytics_q2min" -> { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q2_li")
      Tables.supplier(spark, dir).createOrReplaceTempView("graft_q2_supp")
      spark.sql(
        """SELECT DISTINCT l.l_partkey AS partkey, s.s_name AS supp_name,
          |  CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
          |FROM graft_q2_li l JOIN graft_q2_supp s ON l.l_suppkey = s.s_suppkey
          |WHERE l.l_partkey <= 200
          |  AND l.l_extendedprice = (
          |    SELECT MIN(l2.l_extendedprice) FROM graft_q2_li l2
          |    WHERE l2.l_partkey = l.l_partkey)
          |ORDER BY partkey, supp_name""".stripMargin)
    },

    // TPC-H Q4-shaped CORRELATED EXISTS (r14): orders in a date window
    // that have at least one line item shipping >60 days after the order
    // date, counted per priority. Written AS a correlated EXISTS in SQL
    // text deliberately: the gate proves Catalyst's RewritePredicateSubquery
    // turns it into a LEFT SEMI join (lineitem never widens the row, the
    // date-window filter pushes to the orders scan). The correlation
    // carries a NON-equi conjunct (l_shipdate > o_orderdate + 60d) on top
    // of the equi key — the shape that breaks engines that can only
    // decorrelate pure equality.
    "analytics_q4exists" -> { (spark, dir) =>
      Tables.orders(spark, dir).createOrReplaceTempView("graft_q4_ord")
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q4_li")
      spark.sql(
        """SELECT o.o_orderpriority, COUNT(*) AS order_count
          |FROM graft_q4_ord o
          |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          |  AND o.o_orderdate < TIMESTAMP '1995-07-01'
          |  AND EXISTS (
          |    SELECT 1 FROM graft_q4_li l
          |    WHERE l.l_orderkey = o.o_orderkey
          |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
          |GROUP BY o.o_orderpriority
          |ORDER BY o.o_orderpriority""".stripMargin)
    },

    // TPC-H Q21-shaped EXISTS + NOT EXISTS on the SAME table (r14):
    // suppliers who were the ONLY "late" (returnflag R) supplier on a
    // finished multi-supplier order. Both subqueries correlate to the
    // same lineitem scan with an anti-equality conjunct — Catalyst must
    // plan ONE left-semi AND ONE left-anti against lineitem, neither
    // surviving as a per-row subquery. At 100 TB all three lineitem legs
    // shuffle on l_orderkey, so they co-partition: AQE reuses the
    // exchange rather than scanning lineitem three independent times.
    "analytics_q21multi" -> { (spark, dir) =>
      Tables.supplier(spark, dir).createOrReplaceTempView("graft_q21_supp")
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q21_li")
      Tables.orders(spark, dir).createOrReplaceTempView("graft_q21_ord")
      spark.sql(
        """SELECT s.s_name, COUNT(*) AS numwait
          |FROM graft_q21_supp s
          |  JOIN graft_q21_li l1 ON s.s_suppkey = l1.l_suppkey
          |  JOIN graft_q21_ord o ON o.o_orderkey = l1.l_orderkey
          |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (
          |    SELECT 1 FROM graft_q21_li l2
          |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM graft_q21_li l3
          |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_returnflag = 'R')
          |GROUP BY s.s_name
          |ORDER BY numwait DESC, s_name
          |LIMIT 100""".stripMargin)
    },

    // TPC-H Q22-shaped NOT IN with a NULLABLE key + uncorrelated scalar
    // subquery (r14): above-average-balance customers with no recent
    // orders, per nation. The inner key is wrapped in a CASE that makes
    // it NULLABLE by schema (never null in fact), so Spark cannot
    // downgrade the NOT IN to a plain anti join — it must plan the
    // NULL-AWARE anti join (three-valued logic: one inner NULL would
    // empty the result). The average is quantized identically on both
    // engines (the Exact.dsum discipline) so the threshold predicate
    // can never flip on a last-ulp disagreement.
    "analytics_q22notin" -> { (spark, dir) =>
      Tables.customer(spark, dir).createOrReplaceTempView("graft_q22_cust")
      Tables.orders(spark, dir).createOrReplaceTempView("graft_q22_ord")
      spark.sql(
        """SELECT CAST(c.c_nationkey AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
          |  CAST(SUM(FLOOR(c.c_acctbal * 100 + 0.5)) AS BIGINT) AS totacctbal_cents
          |FROM graft_q22_cust c
          |WHERE c.c_acctbal > (
          |    SELECT (SUM(FLOOR(c2.c_acctbal * 10000.0 + 0.5)) / 10000.0) / COUNT(*)
          |    FROM graft_q22_cust c2 WHERE c2.c_acctbal > 0.0)
          |  AND c.c_custkey NOT IN (
          |    SELECT CASE WHEN o.o_custkey < 0 THEN NULL ELSE o.o_custkey END
          |    FROM graft_q22_ord o
          |    WHERE o.o_orderdate >= TIMESTAMP '2000-01-01')
          |GROUP BY c.c_nationkey
          |ORDER BY cntrycode""".stripMargin)
    },

    // TPC-H Q17-shaped AGGREGATE-IN-PREDICATE (r15): small-quantity
    // revenue for one brand — each line item compares against a
    // correlated scalar AVG over the SAME lineitem table, keyed by the
    // OUTER part's key. Written as a correlated subquery in SQL text
    // deliberately: Catalyst must decorrelate it into a per-partkey AVG
    // aggregate joined back (RewriteCorrelatedScalarSubquery) — the
    // canonical "aggregate in a filter" shape Q2 started, now with the
    // aggregate over the FACT table (at 100 TB: one extra lineitem
    // aggregation co-partitioned on l_partkey, never a per-row scan).
    // The average is quantized identically on both engines (the
    // Exact.dsum discipline) so the threshold can never flip on a
    // last-ulp disagreement; the output is integer cents.
    "analytics_q17avg" -> { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q17_li")
      Tables.part(spark, dir).createOrReplaceTempView("graft_q17_part")
      spark.sql(
        """SELECT CAST(SUM(FLOOR(l.l_extendedprice * 100 + 0.5)) AS BIGINT) AS revenue_cents,
          |  COUNT(*) AS n_small_lines
          |FROM graft_q17_li l JOIN graft_q17_part p ON p.p_partkey = l.l_partkey
          |WHERE p.p_brand = 'Brand#1'
          |  AND l.l_quantity < (
          |    SELECT 0.5 * (SUM(FLOOR(l2.l_quantity * 10000.0 + 0.5)) / 10000.0) / COUNT(*)
          |    FROM graft_q17_li l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
    },

    // TPC-H Q20-shaped TWO-LEVEL DECORRELATION (r15): an IN subquery
    // whose body itself filters through a NESTED correlated scalar AVG
    // (correlated to the IN body's table, not the outermost query).
    // Catalyst must peel both levels: the inner scalar becomes a
    // per-partkey aggregate joined inside the IN body, the IN becomes a
    // left-semi join on s_suppkey. Closes the correlated-subquery
    // family Q2/Q4/Q17/Q21/Q22 span. Threshold arithmetic quantized as
    // in q17/q22 so both engines pick the identical supplier set.
    "analytics_q20nested" -> { (spark, dir) =>
      Tables.supplier(spark, dir).createOrReplaceTempView("graft_q20_supp")
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q20_li")
      spark.sql(
        """SELECT s.s_suppkey, s.s_name
          |FROM graft_q20_supp s
          |WHERE s.s_suppkey IN (
          |  SELECT l1.l_suppkey FROM graft_q20_li l1
          |  WHERE l1.l_partkey <= 30
          |    AND l1.l_quantity > (
          |      SELECT 2.0 * (SUM(FLOOR(l2.l_quantity * 10000.0 + 0.5)) / 10000.0) / COUNT(*)
          |      FROM graft_q20_li l2 WHERE l2.l_partkey = l1.l_partkey))
          |ORDER BY s.s_suppkey""".stripMargin)
    },

    // TPC-H Q7-shaped: volume shipped between two nation pairs by year —
    // TWO INDEPENDENT dim chains (supplier→nation₁, customer→orders→
    // nation₂) meeting at lineitem, with the symmetric pair predicate
    // applied across them. The join-order stress here is that neither
    // nation filter alone prunes much; the cross-chain pair condition
    // does, and it can only apply after both chains are joined.
    "analytics_q7" -> { (spark, dir) =>
      val n1 = Tables.nation(spark, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(spark, dir).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val l = Tables.lineitem(spark, dir)
      val s = Tables.supplier(spark, dir)
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      l.join(s, l("l_suppkey") === s("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), s("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(l("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8-shaped 7-table market share: one nation's share of revenue
    // for one part type in one region, per year — the DEEPEST plan in
    // the suite (part⋈lineitem⋈supplier⋈orders⋈customer⋈nation⋈region +
    // a second nation dim on the supplier chain), with a conditional-sum
    // ratio on top. part is filtered selectively (one p_type) so the CBO
    // should drive the join order from that filter.
    "analytics_q8" -> { (spark, dir) =>
      val p = Tables.part(spark, dir).filter(col("p_type") === "STANDARD")
      val l = Tables.lineitem(spark, dir)
      val s = Tables.supplier(spark, dir)
      val o = Tables.orders(spark, dir)
      val c = Tables.customer(spark, dir)
      val cn = Tables.nation(spark, dir).select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val sn = Tables.nation(spark, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val r = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
      p.join(l, p("p_partkey") === l("l_partkey"))
        .join(s, l("l_suppkey") === s("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(cn), c("c_nationkey") === col("c_nk"))
        .join(broadcast(r), cn("n_regionkey") === r("r_regionkey"))
        .join(broadcast(sn), s("s_nationkey") === col("s_nk"))
        .groupBy(year(o("o_orderdate")).cast("long").as("o_year"))
        .agg(
          dsum(
            when(col("supp_nation") === "NATION_5", l("l_extendedprice") * (lit(1.0) - l("l_discount")))
              .otherwise(lit(0.0))).as("brazil_rev"),
          dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("total_rev"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q6-shaped SCAN-ONLY aggregate (r15): forecast-revenue-change —
    // three independent range predicates and a 1-row sum, NO join. The
    // shape exists to pin the cheapest possible plan: every predicate
    // must reach the parquet scan (PushedFilters carries shipdate,
    // discount, AND quantity), the projection must prune to the 4 used
    // columns, and the only exchange is the 1-row final aggregate. At
    // 100 TB this query is pure scan bandwidth — any post-scan filter
    // or extra column read is the whole regression.
    "analytics_q6" -> { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(
          col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'") &&
            col("l_discount") >= lit(0.02) && col("l_discount") <= lit(0.06) &&
            col("l_quantity") < lit(24.0))
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // TPC-H Q9-shaped LIKE-driven profit rollup (r15): parts matching a
    // substring pattern ('%red%' — the fixture has no ps_supplycost, so
    // profit is the discounted revenue), through lineitem⋈supplier⋈orders,
    // rolled up by supplier nation and order year. The LIKE cannot prune
    // at the row-group level, so the plan's scale posture is: filter part
    // FIRST (200→~27 rows per 1k parts), then let that selective side
    // drive the join order into the fact table; nation broadcast.
    "analytics_q9" -> { (spark, dir) =>
      val p = Tables.part(spark, dir).filter(col("p_name").like("%red%"))
      val l = Tables.lineitem(spark, dir)
      val s = Tables.supplier(spark, dir)
      val o = Tables.orders(spark, dir)
      val n = Tables.nation(spark, dir)
      p.join(l, p("p_partkey") === l("l_partkey"))
        .join(s, l("l_suppkey") === s("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name").as("nation"), year(o("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q11-shaped GROUP-HAVING vs an UNCORRELATED GLOBAL SCALAR
    // (r15): per-part value within one nation's suppliers, keeping only
    // parts above 2× the average per-part value of the SAME filtered
    // set. The threshold is scale-FREE (relative to the per-key mean,
    // not a fixed fraction of the total, which shrinks per-key as the
    // part count grows) — the gate stays non-trivially selective at
    // every SF. Catalyst plans the scalar once (one extra pass over the
    // filtered join, subquery-reused, never per-group); value sums are
    // integer cents so the HAVING comparison can never flip on a
    // last-ulp disagreement.
    "analytics_q11" -> { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q11_li")
      Tables.supplier(spark, dir).createOrReplaceTempView("graft_q11_supp")
      Tables.nation(spark, dir).createOrReplaceTempView("graft_q11_nat")
      spark.sql(
        """SELECT l_partkey, CAST(SUM(FLOOR(l_extendedprice * l_quantity * 100 + 0.5)) AS BIGINT) AS value_cents
          |FROM graft_q11_li JOIN graft_q11_supp ON l_suppkey = s_suppkey
          |  JOIN graft_q11_nat ON s_nationkey = n_nationkey
          |WHERE n_name = 'NATION_3'
          |GROUP BY l_partkey
          |HAVING SUM(FLOOR(l_extendedprice * l_quantity * 100 + 0.5)) > 2.0 * (
          |  SELECT SUM(FLOOR(l2.l_extendedprice * l2.l_quantity * 100 + 0.5)) / COUNT(DISTINCT l2.l_partkey)
          |  FROM graft_q11_li l2 JOIN graft_q11_supp s2 ON l2.l_suppkey = s2.s_suppkey
          |    JOIN graft_q11_nat n2 ON s2.s_nationkey = n2.n_nationkey
          |  WHERE n2.n_name = 'NATION_3')
          |ORDER BY value_cents DESC, l_partkey""".stripMargin)
    },

    // TPC-H Q12-shaped CONDITIONAL TWO-WAY COUNT over a fact⋈fact join
    // (r15): late-shipped lines (shipdate > orderdate + 90d — the fixture
    // has no commit/receipt dates) in one shipdate year, split by urgent
    // vs non-urgent order priority, per returnflag (the shipmode
    // stand-in). The shape: the date window pushes to the lineitem scan,
    // the lateness predicate is join-level (references both sides), and
    // the CASE sums fold into ONE aggregate pass — engines that plan a
    // pass per conditional sum lose linearly with the number of arms.
    "analytics_q12" -> { (spark, dir) =>
      val o = Tables.orders(spark, dir)
      val l = Tables.lineitem(spark, dir).filter(
        col("l_shipdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
      val isHigh = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(l("l_returnflag"))
        .agg(
          sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!isHigh, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    // TPC-H Q13-shaped DOUBLE AGGREGATION with a predicate INSIDE the
    // outer join's ON clause (r15): order count per customer — counting
    // only non-urgent orders, but KEEPING order-less customers (the
    // filter must live in the ON clause; in WHERE it would silently turn
    // the left join inner) — then the distribution of those counts.
    // Two shuffles by construction (c_custkey, then c_count) and both
    // key spaces shrink monotonically; at 100 TB the second is
    // metadata-sized.
    "analytics_q13" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir)
      c.join(o, c("c_custkey") === o("o_custkey") && o("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q14-shaped PROMO-SHARE RATIO (r15): promo revenue as a
    // percentage of total revenue for one shipdate quarter. Both sums
    // quantize through the Exact discipline, so each is an integral
    // double; their quotient (and the ×100) is then correctly rounded
    // IEEE arithmetic — identical on both engines, no cents-output
    // dodge needed for a ratio. Date window pushes to lineitem; part is
    // the broadcast dim.
    "analytics_q14" -> { (spark, dir) =>
      val p = Tables.part(spark, dir)
      val l = Tables.lineitem(spark, dir).filter(
        col("l_shipdate") >= expr("TIMESTAMP '1996-03-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1996-06-01 00:00:00'"))
      val rev = l("l_extendedprice") * (lit(1.0) - l("l_discount"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg((lit(100.0) *
          dsum(when(p("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          dsum(rev)).as("promo_pct"))
    },

    // TPC-H Q15-shaped TOP-SUPPLIER over an AGGREGATED VIEW USED TWICE
    // (r15): quarterly revenue per supplier, returning the supplier(s)
    // at the MAX. The revenue view feeds both the main join and the
    // scalar MAX — Catalyst should reuse the aggregate subtree (one
    // lineitem scan + one shuffle, not two); revenue is integer cents so
    // the `= MAX` tie semantics are exact (the float-equality trap the
    // original Q15 is famous for).
    "analytics_q15" -> { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q15_li")
      Tables.supplier(spark, dir).createOrReplaceTempView("graft_q15_supp")
      spark.sql(
        """WITH rev AS (
          |  SELECT l_suppkey AS supplier_no,
          |    CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)) AS BIGINT) AS total_cents
          |  FROM graft_q15_li
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          |  GROUP BY l_suppkey)
          |SELECT s.s_suppkey, s.s_name, r.total_cents
          |FROM graft_q15_supp s JOIN rev r ON s.s_suppkey = r.supplier_no
          |WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
          |ORDER BY s.s_suppkey""".stripMargin)
    },

    // TPC-H Q16-shaped DISTINCT-COUNT excluding a supplier set (r15):
    // distinct suppliers per (brand, type, size) bucket, excluding one
    // brand/type, a size IN-list, and suppliers below an account-balance
    // floor (the fixture's stand-in for the complaints predicate). The
    // deliberate contrast to q22notin: Spark force-marks every
    // file-source column nullable, so the original NOT IN would ALWAYS
    // pay the null-aware anti join — the exclusion is therefore spelled
    // as the equivalent NOT EXISTS (the standard production rewrite when
    // the key is non-null in fact), which decorrelates to a plain
    // LeftAnti on straight equality. PlanAuditSpec pins that no
    // null-aware machinery survives.
    "analytics_q16" -> { (spark, dir) =>
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q16_li")
      Tables.part(spark, dir).createOrReplaceTempView("graft_q16_part")
      Tables.supplier(spark, dir).createOrReplaceTempView("graft_q16_supp")
      spark.sql(
        """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
          |FROM graft_q16_li JOIN graft_q16_part ON p_partkey = l_partkey
          |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM graft_q16_supp s
          |    WHERE s.s_suppkey = l_suppkey AND s.s_acctbal < 2000.0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    },

    // TPC-H Q18-shaped IN over a GROUPED-HAVING subquery (r15): orders
    // whose total quantity crosses a threshold, with the full customer
    // display tuple. The IN body is an AGGREGATE (per-orderkey quantity
    // sum), so decorrelation must plan a left-semi against an aggregated
    // subtree — and both the semi probe and the outer lineitem leg hash
    // on l_orderkey, so at 100 TB AQE reuses one exchange for both.
    // Quantities quantize to cents so the HAVING threshold is exact.
    "analytics_q18" -> { (spark, dir) =>
      Tables.customer(spark, dir).createOrReplaceTempView("graft_q18_cust")
      Tables.orders(spark, dir).createOrReplaceTempView("graft_q18_ord")
      Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q18_li")
      spark.sql(
        """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
          |  CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
          |  CAST(SUM(FLOOR(l.l_quantity * 100 + 0.5)) AS BIGINT) AS sum_qty_cents
          |FROM graft_q18_cust c JOIN graft_q18_ord o ON c.c_custkey = o.o_custkey
          |  JOIN graft_q18_li l ON o.o_orderkey = l.l_orderkey
          |WHERE o.o_orderkey IN (
          |  SELECT l_orderkey FROM graft_q18_li GROUP BY l_orderkey
          |  HAVING SUM(FLOOR(l_quantity * 100 + 0.5)) > 15000)
          |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
          |ORDER BY totalprice_cents DESC, o.o_orderkey
          |LIMIT 100""".stripMargin)
    },

    // TPC-H Q19-shaped OR-of-ANDs SPANNING the join (r15): three
    // disjunct brand/size/quantity envelopes, each mixing part and
    // lineitem columns — the canonical predicate no single side can
    // evaluate alone. The scale posture Catalyst must find (PlanAuditSpec
    // pins it): extract the per-side residues of the CNF conversion so
    // BOTH scans still carry pushed filters (brand∈{1,2,3} + size range
    // to part, the quantity envelope to lineitem), with the full
    // disjunction evaluated once post-join.
    "analytics_q19" -> { (spark, dir) =>
      val p = Tables.part(spark, dir)
      val l = Tables.lineitem(spark, dir)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (p("p_brand") === "Brand#1" && p("p_size").between(1, 15) && l("l_quantity").between(1.0, 20.0)) ||
            (p("p_brand") === "Brand#2" && p("p_size").between(10, 30) && l("l_quantity").between(5.0, 35.0)) ||
            (p("p_brand") === "Brand#3" && p("p_size").between(20, 50) && l("l_quantity").between(10.0, 50.0)))
        .agg(
          dsum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Range (interval) self-join, banded: per error event, how many events
    // of the same user landed in the preceding 5 minutes. The 5-minute
    // epoch bucket turns the range condition into an equi-join on
    // (user, bucket) with 2 candidate buckets per probe row — shuffle
    // volume stays linear at any scale.
    "join_range_events" -> { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val bucket = (t: org.apache.spark.sql.Column) =>
        floor(t.cast("double") / lit(300.0)).cast("long")
      val errs = ev
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
        .withColumn("__b", explode(array(bucket(col("a_ts")) - 1, bucket(col("a_ts")))))
      val all = ev
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
        .withColumn("__b", bucket(col("b_ts")))
      // LEFT join from the probes keeps zero-match errors without a third
      // scan of events (round-1 verdict: the old join-back formulation
      // scanned events 3×): unmatched probe rows carry a null b_ts, and
      // count(b_ts) ignores nulls, so per-event counts stay exact even
      // though each error probes 2 candidate buckets.
      errs
        .join(
          all,
          errs("__b") === all("__b") && col("a_user") === col("b_user") &&
            col("b_ts") >= col("a_ts") - expr("INTERVAL 5 MINUTES") &&
            col("b_ts") < col("a_ts"),
          "left"
        )
        .groupBy(col("event_id"))
        .agg(count(col("b_ts")).as("n_prior"))
        .orderBy(col("event_id"))
    },

    // Theta (band) join: |c_acctbal - s_acctbal| < 10, banded on
    // floor(bal/10) so it plans as an equi-join, not a nested loop.
    "join_band_theta" -> { (spark, dir) =>
      val c = Tables
        .customer(spark, dir)
        .select(col("c_nationkey"), col("c_acctbal"))
        .withColumn("__band", floor(col("c_acctbal") / lit(10.0)).cast("long"))
        .withColumn("__b", explode(array(col("__band") - 1, col("__band"), col("__band") + 1)))
      val s = Tables
        .supplier(spark, dir)
        .select(col("s_acctbal"))
        .withColumn("__b", floor(col("s_acctbal") / lit(10.0)).cast("long"))
      c.join(s, c("__b") === s("__b") && abs(col("c_acctbal") - col("s_acctbal")) < lit(10.0))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("c_nationkey"))
    },

    // Forward as-of join: each event picks up the user's EARLIEST order
    // at-or-after the event time (same single-shuffle union+window shape,
    // scanning forward — see AsOfJoin.asOfForward).
    "join_asof_forward" -> { (spark, dir) =>
      val e = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables
        .orders(spark, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin
        .asOfForward(e, "user_id", "ts", o, "o_custkey", "o_orderdate", Seq("o_orderkey", "o_orderdate"))
        .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("event_id"))
    },

    // As-of join: each event picks up the user's latest order at-or-before
    // the event time (union+window, one shuffle — see AsOfJoin).
    "join_asof" -> { (spark, dir) =>
      val e = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables
        .orders(spark, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin
        .asOf(e, "user_id", "ts", o, "o_custkey", "o_orderdate", Seq("o_orderkey", "o_orderdate"))
        .select(col("event_id"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("event_id"))
    },

    // The SQL spelling: same as-of semantics reached through the
    // graft_asof_join TABLE FUNCTION (GraftExtensions), same ASOF-join
    // oracle BY REFERENCE — a SQL-only user gets the single-shuffle
    // union-and-window plan without the Scala API. The payload column
    // names collide with nothing on the left (enforced by the TVF).
    "sql_asof_join" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      Tables
        .events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView("graft_events")
      Tables
        .orders(spark, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .createOrReplaceTempView("graft_orders_daily")
      spark.sql(
        """SELECT event_id, o_orderkey, o_orderdate
          |FROM graft_asof_join('graft_events', 'user_id', 'ts',
          |                     'graft_orders_daily', 'o_custkey', 'o_orderdate',
          |                     'o_orderkey,o_orderdate', 'backward')
          |ORDER BY event_id""".stripMargin)
    }
  )

  val oracles: Map[String, String] = Map(
    "join_inner_topn" ->
      s"""SELECT o_orderkey, o_orderdate,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey ASC
         |LIMIT 10""".stripMargin,
    "join_left_nulls" ->
      s"""SELECT p_partkey, COUNT(l_orderkey) AS n_li,
         |  COALESCE(${sqlSum("l_quantity")}, 0.0) AS sum_qty
         |FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
         |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,
    "join_right" ->
      """SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_supp
        |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "join_full" ->
      """WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
        |     ss AS (SELECT s_nationkey AS nk2, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT COALESCE(nk, nk2) AS nationkey,
        |       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM cc FULL JOIN ss ON nk = nk2 ORDER BY nationkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_bloom_semi" ->
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "join_star_broadcast" ->
      s"""SELECT r_name,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "analytics_q3" ->
      s"""SELECT l_orderkey, o_orderdate, n_name,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY l_orderkey, o_orderdate, n_name
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 10""".stripMargin,
    "analytics_q5" ->
      s"""SELECT n_name,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "analytics_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    // Same correlated-subquery text — DuckDB decorrelates it too, so a
    // green hash proves both engines' rewrites agree with the sequential
    // definition.
    "analytics_q2min" ->
      """SELECT DISTINCT l.l_partkey AS partkey, s.s_name AS supp_name,
        |  CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE l.l_partkey <= 200
        |  AND l.l_extendedprice = (
        |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        |    WHERE l2.l_partkey = l.l_partkey)
        |ORDER BY partkey, supp_name""".stripMargin,
    // Same correlated texts as the Spark side (modulo DuckDB's interval
    // spelling) — DuckDB decorrelates them independently, so green hashes
    // prove both engines' semi/anti/null-aware rewrites agree with the
    // sequential definition.
    "analytics_q4exists" ->
      """SELECT o.o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1995-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,
    "analytics_q21multi" ->
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM supplier s
        |  JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "analytics_q22notin" ->
      """SELECT CAST(c.c_nationkey AS BIGINT) AS cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(FLOOR(c.c_acctbal * 100 + 0.5)) AS BIGINT) AS totacctbal_cents
        |FROM customer c
        |WHERE c.c_acctbal > (
        |    SELECT (SUM(FLOOR(c2.c_acctbal * 10000.0 + 0.5)) / 10000.0) / COUNT(*)
        |    FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |  AND c.c_custkey NOT IN (
        |    SELECT CASE WHEN o.o_custkey < 0 THEN NULL ELSE o.o_custkey END
        |    FROM orders o
        |    WHERE o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c.c_nationkey
        |ORDER BY cntrycode""".stripMargin,
    "analytics_q17avg" ->
      """SELECT CAST(SUM(FLOOR(l.l_extendedprice * 100 + 0.5)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_small_lines
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND l.l_quantity < (
        |    SELECT 0.5 * (SUM(FLOOR(l2.l_quantity * 10000.0 + 0.5)) / 10000.0) / COUNT(*)
        |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin,
    "analytics_q20nested" ->
      """SELECT s.s_suppkey, s.s_name
        |FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l1.l_suppkey FROM lineitem l1
        |  WHERE l1.l_partkey <= 30
        |    AND l1.l_quantity > (
        |      SELECT 2.0 * (SUM(FLOOR(l2.l_quantity * 10000.0 + 0.5)) / 10000.0) / COUNT(*)
        |      FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
        |ORDER BY s.s_suppkey""".stripMargin,
    "analytics_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "analytics_q8" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${sqlSum("CASE WHEN n1.n_name = 'NATION_5' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS brazil_rev,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS total_rev
         |FROM part JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  JOIN region ON n2.n_regionkey = r_regionkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
         |GROUP BY 1
         |ORDER BY o_year""".stripMargin,
    "analytics_q6" ->
      s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.02 AND l_discount <= 0.06
         |  AND l_quantity < 24.0""".stripMargin,
    "analytics_q9" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS profit
         |FROM part JOIN lineitem ON p_partkey = l_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin,
    // Same subquery-bearing texts as the Spark side (q11/q15/q16/q18) —
    // DuckDB plans them independently, so green hashes prove both
    // engines' rewrites agree with the sequential definition.
    "analytics_q11" ->
      """SELECT l_partkey, CAST(SUM(FLOOR(l_extendedprice * l_quantity * 100 + 0.5)) AS BIGINT) AS value_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING SUM(FLOOR(l_extendedprice * l_quantity * 100 + 0.5)) > 2.0 * (
        |  SELECT SUM(FLOOR(l2.l_extendedprice * l2.l_quantity * 100 + 0.5)) / COUNT(DISTINCT l2.l_partkey)
        |  FROM lineitem l2 JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |  WHERE n2.n_name = 'NATION_3')
        |ORDER BY value_cents DESC, l_partkey""".stripMargin,
    "analytics_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "analytics_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "analytics_q14" ->
      s"""SELECT 100.0 *
         |  ${sqlSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
         |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS promo_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-06-01'""".stripMargin,
    "analytics_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_cents
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,
    "analytics_q16" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM supplier s
        |    WHERE s.s_suppkey = l_suppkey AND s.s_acctbal < 2000.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "analytics_q18" ->
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
        |  CAST(SUM(FLOOR(l.l_quantity * 100 + 0.5)) AS BIGINT) AS sum_qty_cents
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(FLOOR(l_quantity * 100 + 0.5)) > 15000)
        |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        |ORDER BY totalprice_cents DESC, o.o_orderkey
        |LIMIT 100""".stripMargin,
    "analytics_q19" ->
      s"""SELECT ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1.0 AND 20.0)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 5.0 AND 35.0)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 10.0 AND 50.0)""".stripMargin,
    "join_range_events" ->
      """SELECT a.event_id, COALESCE(cnt.n, 0) AS n_prior
        |FROM events a LEFT JOIN (
        |  SELECT a.event_id AS eid, COUNT(*) AS n
        |  FROM events a JOIN events b
        |    ON b.user_id = a.user_id
        |   AND b.ts >= a.ts - INTERVAL '5 minutes' AND b.ts < a.ts
        |  WHERE a.event_type = 'error'
        |  GROUP BY 1
        |) cnt ON cnt.eid = a.event_id
        |WHERE a.event_type = 'error'
        |ORDER BY a.event_id""".stripMargin,
    "join_band_theta" ->
      """SELECT c_nationkey, COUNT(*) AS n_pairs
        |FROM customer JOIN supplier ON ABS(c_acctbal - s_acctbal) < 10.0
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "join_asof_forward" ->
      """WITH od AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |            FROM orders GROUP BY 1, 2),
        |nxt AS (
        |  SELECT e.event_id, e.user_id,
        |    (SELECT MIN(od.o_orderdate) FROM od
        |     WHERE od.o_custkey = e.user_id AND od.o_orderdate >= e.ts) AS nd
        |  FROM events e)
        |SELECT n.event_id, od.o_orderkey, n.nd AS o_orderdate
        |FROM nxt n LEFT JOIN od ON od.o_custkey = n.user_id AND od.o_orderdate = n.nd
        |ORDER BY n.event_id""".stripMargin,
    "join_asof" -> asofBackwardOracle,
    "sql_asof_join" -> asofBackwardOracle
  )

  /** Shared by join_asof and its TVF spelling sql_asof_join — one
    * contract, divergence impossible. */
  private lazy val asofBackwardOracle: String =
    """WITH od AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |            FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, od.o_orderkey, od.o_orderdate
      |FROM events e ASOF LEFT JOIN od
      |  ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
      |ORDER BY e.event_id""".stripMargin
}
