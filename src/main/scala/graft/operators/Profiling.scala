package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Warehouse-side table maintenance queries: column statistics profiling
  * (the input to any cost-based optimizer), declarative data-quality
  * constraint checks, equal-width histograms, and an SCD2 dimension
  * merge. The reference's engine feeds a Hive-queryable warehouse
  * (reference README.md:13-22); these are the operations a warehouse
  * operator runs ON those landed tables.
  *
  * Scale posture:
  * - `stats_profile`: ONE scan; the multi-column exact-ndv agg plans as
  *   Catalyst's Expand (rows × #columns before the partial agg) — the
  *   standard exact plan. At 100 TB swap `countDistinct` for
  *   `approx_count_distinct` (same shape, no Expand) — the query shape
  *   and the output contract don't change, which is why ndv is a column
  *   here and not a constant.
  * - `dq_checks`: each check is an independent scan+agg (pruned to the
  *   checked columns); the referential check is a broadcast anti join.
  *   Constant-width output regardless of input size.
  * - `agg_histogram`: two passes (global min/max, then the bucketing
  *   agg) — the first pass is metadata-scale output and broadcast back.
  *   Bucket math is integer cents end to end: both engines compute
  *   identical bucket ids, no float-boundary flake.
  * - `scd2_merge`: the classic slowly-changing-dimension type-2 merge as
  *   semi/anti joins + union — every join broadcast-able when the update
  *   batch is small (the common case), shuffle-join otherwise; never a
  *   full-table rewrite of unchanged rows.
  */
object Profiling {
  type Q = (SparkSession, String) => DataFrame

  /** Tag every row with the names of the DQ rules it VIOLATES: each rule
    * is (name, predicate-that-must-hold); the added `violations` column
    * is the ordered array of failed rule names (empty = valid). One
    * codegen'd per-row map — rules compose as plain Columns, no UDF. */
  def withViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.withColumn("violations",
      array_remove(
        array(rules.map { case (n, mustHold) =>
          when(!mustHold, lit(n)).otherwise(lit(""))
        }: _*),
        ""))

  /** The ENFORCEMENT split: (valid rows, quarantined rows carrying their
    * `violations` reasons) — write the second to the dead-letter table.
    * Both sides derive from one tagged frame; Spark scans it once per
    * materialized side (or twice — cache the tagged frame when both
    * sides are written in one job). */
  def quarantineSplit(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val tagged = withViolations(df, rules)
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }

  /** One profile row per column: nulls, exact ndv, min/max rendered
    * deterministically (integers verbatim; doubles as integer cents;
    * timestamps as ISO seconds — never raw double→string, which is
    * shortest-repr in Spark but round-trip in some engines).
    *
    * Plan shape: one PRUNED single-column scan + aggregate per column,
    * unioned — deliberately NOT one wide aggregate with k exact
    * countDistincts, which Catalyst plans as an Expand (row count × k,
    * every row carrying every column) feeding one grouping: measured
    * 16 s vs ~2 s at sf0.1 for 7 columns. Per-column subplans each read
    * exactly one parquet column, run as independent stages, and a
    * single-distinct aggregate needs no Expand at all. */
  private def profile(df: DataFrame, cols: Seq[(String, Column => Column)]): DataFrame =
    cols.map { case (c, fmt) =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          fmt(min(col(c))).as("min_s"),
          fmt(max(col(c))).as("max_s"))
        .select(
          lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionAll _).orderBy(col("col_name"))

  private val asLong: Column => Column = c => c.cast("string")
  private val asCents: Column => Column = c => round(c * 100).cast("long").cast("string")
  private val asIso: Column => Column = c => date_format(c, "yyyy-MM-dd HH:mm:ss")
  private val asIs: Column => Column = identity

  val queries: Map[String, Q] = Map(
    // ANALYZE-style per-column stats over the fact table.
    "stats_profile" -> { (spark, dir) =>
      profile(
        Tables.lineitem(spark, dir),
        Seq(
          ("l_orderkey", asLong),
          ("l_linenumber", asLong),
          ("l_quantity", asCents),
          ("l_extendedprice", asCents),
          ("l_returnflag", asIs),
          ("l_linestatus", asIs),
          ("l_shipdate", asIso)
        )
      )
    },

    // Declarative constraint suite: name, violation count, pass flag.
    "dq_checks" -> { (spark, dir) =>
      val cust = Tables.customer(spark, dir)
      val ord  = Tables.orders(spark, dir)
      val li   = Tables.lineitem(spark, dir)
      val docs = Tables.documents(spark, dir)
      val ev   = Tables.events(spark, dir)

      def check(name: String, violations: DataFrame): DataFrame =
        violations.agg(count(lit(1)).as("n_violations"))
          .select(
            lit(name).as("check_name"),
            col("n_violations"),
            (col("n_violations") === 0L).as("pass"))

      val fk = check(
        "orders_custkey_fk",
        ord.select(col("o_custkey"))
          .join(broadcast(cust.select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"), "left_anti"))
      val pk = check(
        "lineitem_pk_unique",
        li.groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(count(lit(1)).as("n")).filter(col("n") > 1))
      val rng = check(
        "customer_acctbal_range",
        cust.filter(col("c_acctbal") < -1000.0 || col("c_acctbal") > 100000.0))
      val txt = check(
        "documents_chars_consistent",
        docs.filter(col("text").isNull || length(col("text")) =!= col("n_chars")))
      val vnn = check(
        "events_value_nonneg",
        ev.filter(col("value") < 0.0))

      fk.unionAll(pk).unionAll(rng).unionAll(txt).unionAll(vnn)
        .orderBy(col("check_name"))
    },

    // DQ ENFORCEMENT (quarantine split) — dq_checks REPORTS, this one
    // ACTS: every row is tagged with the names of the rules it violates
    // ([[withViolations]]); valid rows pass through, violating rows
    // quarantine with machine-readable reasons (the split a pipeline
    // writes to its dead-letter table). The fixture is all-valid, so
    // violations are INJECTED deterministically (negative price for
    // keys ≡ 0 mod 101, an invalid status for keys ≡ 0 mod 89 — same
    // expressions on both engines, the text_redact recipe), and the
    // gate aggregates per reason-combination so multi-rule rows pin the
    // reason-ordering too. Pure per-row map + one hash agg — no
    // shuffle before the agg, trivially parallel at 100 TB.
    "dq_quarantine" -> { (spark, dir) =>
      val src = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey").as("k"),
          when(pmod(col("o_orderkey"), lit(101)) === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")).as("price"),
          when(pmod(col("o_orderkey"), lit(89)) === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("st"))
      val tagged = withViolations(src, Seq(
        "nonpositive_price" -> (col("price") > 0),
        "invalid_status" -> col("st").isin("F", "O", "P")))
      tagged
        .withColumn("status",
          when(size(col("violations")) === 0, lit("valid"))
            .otherwise(concat_ws("+", col("violations"))))
        .groupBy(col("status"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_key"),
          dsum(col("price")).as("sum_price"))
        .orderBy(col("status"))
    },

    // Equal-width 10-bucket histogram of l_extendedprice, all math in
    // integer cents: bucket = (cents - min)*10 div (max - min + 1), so
    // every value (max included) lands in 0..9 with no float boundary.
    "agg_histogram" -> { (spark, dir) =>
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val li = Tables.lineitem(spark, dir).select(cents.as("c"))
      val bounds = li.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
      li.crossJoin(broadcast(bounds))
        .withColumn("bucket", expr("(c - lo) * 10 div (hi - lo + 1)"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("c")).as("min_cents"),
          max(col("c")).as("max_cents"))
        .orderBy(col("bucket"))
    },

    // Key-skew diagnostics for a join/aggregation key: the top-5 hottest
    // keys alongside the key-count distribution (exact p90 via
    // DistributedRank.withGlobalCumSum over ones — a distributed rank,
    // NOT a single-partition window, so the report itself survives a
    // billion-key fact table). The p90 rank is integer math:
    // (9·n_keys + 9) div 10 = ceil(0.9·n_keys) with no float.
    "skew_report" -> { (spark, dir) =>
      val c = Tables.lineitem(spark, dir)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      val stats = c.agg(
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        sum(col("cnt")).as("total_rows"))
      val ranked = DistributedRank.withGlobalCumSum(
        c.withColumn("one", lit(1L)), "one",
        Seq(col("cnt"), col("l_suppkey")), cumCol = "rk")
      val p90 = ranked
        .crossJoin(broadcast(stats))
        .filter(col("rk") === expr("(9 * n_keys + 9) div 10"))
        .select(col("cnt").as("p90_cnt"))
      c.orderBy(col("cnt").desc, col("l_suppkey")).limit(5)
        .crossJoin(broadcast(stats))
        .crossJoin(broadcast(p90))
        .select(
          col("l_suppkey"), col("cnt"), col("n_keys"),
          col("max_cnt"), col("p90_cnt"), col("total_rows"))
        .orderBy(col("cnt").desc, col("l_suppkey"))
    },

    // PARETO concentration (the 80/20 read on revenue): how many
    // customers carry 80% of revenue, plus the top customer's share.
    // The descending running revenue share is a GLOBAL cumsum →
    // DistributedRank.withGlobalCumSum again; the 80% test is the
    // integer cross-multiplication prev_cum·5 < total·4 — no float
    // anywhere, shares reported in exact micro-units.
    "pareto_share" -> { (spark, dir) =>
      val perCust = Tables.orders(spark, dir)
        .select(col("o_custkey"), floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("r"))
        .groupBy(col("o_custkey")).agg(sum(col("r")).as("rev_q"))
      val total = perCust.agg(sum(col("rev_q")).as("total"), max(col("rev_q")).as("top1"))
      DistributedRank
        .withGlobalCumSum(perCust, "rev_q", Seq(col("rev_q").desc, col("o_custkey").asc), "cum")
        .crossJoin(broadcast(total))
        .select(
          col("o_custkey"), col("rev_q"), col("cum"), col("total"), col("top1"),
          ((col("cum") - col("rev_q")) * 5 < col("total") * 4).as("needed"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(when(col("needed"), 1L).otherwise(0L)).as("n_top80"),
          max(expr("top1 * 1000000 div total")).as("top1_share_micro"),
          max(col("total")).as("total_rev_q"))
    },

    // GINI coefficient over per-customer revenue — pareto_share's scalar
    // sibling: G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) with ranks from the
    // distributed global cumsum of ones (ascending revenue, custkey
    // tiebreak). Every sum is integer; the closed form combines in
    // decimal(38,0) (the linreg discipline — n·Σx approaches int64 at
    // sf10) and drops to double once, in identical textual order.
    "agg_gini" -> { (spark, dir) =>
      val d38 = "decimal(38,0)"
      val perCust = Tables.orders(spark, dir)
        .select(col("o_custkey"), floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("r"))
        .groupBy(col("o_custkey")).agg(sum(col("r")).as("rev_q"))
      DistributedRank
        .withGlobalCumSum(
          perCust.withColumn("one", lit(1L)), "one",
          Seq(col("rev_q").asc, col("o_custkey").asc), cumCol = "rank")
        .agg(
          count(lit(1)).as("n"),
          sum(col("rev_q")).as("sx"),
          sum((col("rank") * col("rev_q")).cast(d38)).as("srx"))
        .select(
          col("n").as("n_customers"),
          col("sx").as("total_rev_q"),
          (expr(s"cast(2 as $d38) * srx - (cast(n as $d38) + 1) * cast(sx as $d38)").cast("double")
            / expr(s"cast(n as $d38) * cast(sx as $d38)").cast("double")).as("gini"))
    },

    // 2-D skyline (Pareto frontier): parts minimizing (size, price).
    // The textbook spelling is a quadratic NOT EXISTS dominance join —
    // the oracle uses it, because oracle scale permits. The distributed
    // plan is the sort-based O(n log n) skyline: collapse to one best-y
    // point per x (a hash agg), then keep a point iff every strictly
    // smaller x has a strictly larger best price — an EXCLUSIVE global
    // running min via DistributedRank (range partition + local window +
    // metadata-scale offsets; never a single-partition window). Prices
    // on the exact cent grid so both engines compare integers.
    "skyline_2d" -> { (spark, dir) =>
      val pts = Tables
        .part(spark, dir)
        .select(
          col("p_size").cast("long").as("x"),
          floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("y"))
        .groupBy(col("x"))
        .agg(min(col("y")).as("y"))
      DistributedRank
        .withGlobalCumMinExclusive(pts, "y", Seq(col("x").asc), cumCol = "pm")
        .filter(col("pm").isNull || col("pm") > col("y"))
        .select(col("x").as("p_size"), col("y").as("best_price_q"))
        .orderBy(col("p_size"))
    },

    // Systematic PPS sampling (probability proportional to size): walk
    // the key-ordered cumulative weight line and pick every row whose
    // weight interval crosses a step boundary (step = total/100 → ~100
    // samples) — the survey-sampling / data-auditing primitive that is
    // fully DETERMINISTIC (no RNG: the sample is a pure function of the
    // data), unlike rand()-based PPS. The cumulative line comes from
    // the distributed two-pass running sum (never a single-partition
    // window); the total joins in as a one-row broadcast. Integer cents
    // end to end, truncating division shared by both engines.
    "sample_pps" -> { (spark, dir) =>
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("w"))
      val withCum =
        DistributedRank.withGlobalCumSum(o, "w", Seq(col("o_orderkey").asc), cumCol = "cum")
      val total = withCum.agg(max(col("cum")).as("t"))
      // greatest(…, 1): with total weight < 100 the step would be 0 and
      // Spark's `div 0` yields NULL (silently empty sample) while DuckDB
      // raises — clamping to 1 on BOTH engines defines the degenerate
      // case identically (every positive-weight row sampled).
      withCum
        .crossJoin(broadcast(total))
        .withColumn("step", expr("greatest(t div 100, 1)"))
        .filter(expr("(cum div step) > ((cum - w) div step)"))
        .select(col("o_orderkey"), col("w"), expr("cum div step").as("bucket"))
        .orderBy(col("o_orderkey"))
    },

    // Table reconciliation / version diff — the anti-entropy audit every
    // pipeline needs after a backfill: classify every key across two
    // table versions as added / removed / changed / unchanged and report
    // counts + absolute value drift. One full-outer equi-join on the key
    // (sort-merge at scale; both sides would be bucketed by key at rest)
    // and a 4-row hash agg — no collects, no row-by-row compare. Version
    // 2 is derived deterministically from version 1 (drop k%97=0, bump
    // price on k%10=3, insert shifted copies of k%101=5) so the oracle
    // reconstructs both sides exactly.
    "table_diff" -> { (spark, dir) =>
      val v1 = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c1"))
      val v2 = v1
        .filter(col("k") % 97 =!= 0)
        .select(
          col("k"),
          when(col("k") % 10 === 3, col("c1") + 100).otherwise(col("c1")).as("c2"))
        .unionAll(
          v1.filter(col("k") % 101 === 5)
            .select((col("k") + lit(10000000L)).as("k"), col("c1").as("c2")))
      v1
        .join(v2, Seq("k"), "full_outer")
        .select(
          when(col("c2").isNull, "removed")
            .when(col("c1").isNull, "added")
            .when(col("c1") =!= col("c2"), "changed")
            .otherwise("unchanged")
            .as("class"),
          abs(coalesce(col("c2"), lit(0L)) - coalesce(col("c1"), lit(0L))).as("d"))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("drift_q"))
        .orderBy(col("class"))
    },

    // SCD2 merge: the update batch (derived deterministically from the
    // dim itself — customers with custkey % 10 = 0 get a new balance and
    // segment) closes the old version and opens version 2; untouched
    // customers keep their single current version.
    "scd2_merge" -> { (spark, dir) =>
      val dim = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      val upd = dim.filter(col("c_custkey") % 10 === 0)
        .select(
          col("c_custkey"),
          (round(col("c_acctbal") * 100).cast("long") + 10000L).as("bal_cents_new"))
      val keys = upd.select(col("c_custkey").as("k"))

      val centsOld = round(col("c_acctbal") * 100).cast("long")
      val unchanged = dim
        .join(broadcast(keys), col("c_custkey") === col("k"), "left_anti")
        .select(
          col("c_custkey"), lit(1L).as("version"), lit(true).as("is_current"),
          centsOld.as("bal_cents"), col("c_mktsegment").as("segment"))
      val closed = dim
        .join(broadcast(keys), col("c_custkey") === col("k"), "left_semi")
        .select(
          col("c_custkey"), lit(1L).as("version"), lit(false).as("is_current"),
          centsOld.as("bal_cents"), col("c_mktsegment").as("segment"))
      val opened = upd.select(
        col("c_custkey"), lit(2L).as("version"), lit(true).as("is_current"),
        col("bal_cents_new").as("bal_cents"), lit("UPDATED").as("segment"))

      unchanged.unionAll(closed).unionAll(opened)
        .orderBy(col("c_custkey"), col("version"))
    }
  )

  val oracles: Map[String, String] = Map(
    // concat_ws skips NULL branches on both engines; the CASE order
    // mirrors the Scala rule order, so multi-violation strings agree.
    "dq_quarantine" ->
      s"""WITH src AS (
         |  SELECT o_orderkey AS k,
         |    CASE WHEN o_orderkey % 101 = 0 THEN -o_totalprice ELSE o_totalprice END AS price,
         |    CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END AS st
         |  FROM orders),
         |c AS (
         |  SELECT k, price,
         |    concat_ws('+',
         |      CASE WHEN NOT (price > 0) THEN 'nonpositive_price' END,
         |      CASE WHEN st NOT IN ('F', 'O', 'P') THEN 'invalid_status' END) AS viol
         |  FROM src)
         |SELECT CASE WHEN viol = '' THEN 'valid' ELSE viol END AS status,
         |  COUNT(*) AS n,
         |  CAST(SUM(k) AS BIGINT) AS sum_key,
         |  ${sqlSum("price")} AS sum_price
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "stats_profile" -> {
      def row(c: String, minmax: String => String) =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  ${minmax(s"MIN($c)")} AS min_s, ${minmax(s"MAX($c)")} AS max_s
           |FROM lineitem""".stripMargin
      val long  = (e: String) => s"CAST($e AS VARCHAR)"
      val cents = (e: String) => s"CAST(CAST(round($e * 100) AS BIGINT) AS VARCHAR)"
      val iso   = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
      val asis  = (e: String) => e
      Seq(
        row("l_orderkey", long), row("l_linenumber", long),
        row("l_quantity", cents), row("l_extendedprice", cents),
        row("l_returnflag", asis), row("l_linestatus", asis),
        row("l_shipdate", iso)
      ).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "dq_checks" ->
      """WITH v AS (
        |  SELECT 'orders_custkey_fk' AS check_name,
        |    (SELECT COUNT(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |      AS n_violations
        |  UNION ALL
        |  SELECT 'lineitem_pk_unique',
        |    (SELECT COUNT(*) FROM (
        |       SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
        |  UNION ALL
        |  SELECT 'customer_acctbal_range',
        |    (SELECT COUNT(*) FROM customer WHERE c_acctbal < -1000.0 OR c_acctbal > 100000.0)
        |  UNION ALL
        |  SELECT 'documents_chars_consistent',
        |    (SELECT COUNT(*) FROM documents WHERE text IS NULL OR len(text) <> n_chars)
        |  UNION ALL
        |  SELECT 'events_value_nonneg',
        |    (SELECT COUNT(*) FROM events WHERE value < 0.0))
        |SELECT check_name, n_violations, n_violations = 0 AS pass
        |FROM v ORDER BY check_name""".stripMargin,
    "agg_histogram" ->
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
        |b AS (SELECT MIN(c) AS lo, MAX(c) AS hi FROM c)
        |SELECT (c.c - b.lo) * 10 // (b.hi - b.lo + 1) AS bucket,
        |  COUNT(*) AS n_rows, MIN(c.c) AS min_cents, MAX(c.c) AS max_cents
        |FROM c, b GROUP BY 1 ORDER BY bucket""".stripMargin,
    "skew_report" ->
      """WITH c AS (SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey),
        |s AS (SELECT COUNT(*) AS n_keys, MAX(cnt) AS max_cnt,
        |  CAST(SUM(cnt) AS BIGINT) AS total_rows FROM c),
        |r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, l_suppkey) AS rk FROM c),
        |p AS (SELECT cnt AS p90_cnt FROM r, s WHERE rk = (9 * n_keys + 9) // 10),
        |t AS (SELECT * FROM c ORDER BY cnt DESC, l_suppkey LIMIT 5)
        |SELECT l_suppkey, cnt, n_keys, max_cnt, p90_cnt, total_rows
        |FROM t, s, p ORDER BY cnt DESC, l_suppkey""".stripMargin,
    "pareto_share" ->
      """WITH pc AS (
        |  SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS rev_q
        |  FROM orders GROUP BY o_custkey),
        |t AS (SELECT CAST(SUM(rev_q) AS BIGINT) AS total, MAX(rev_q) AS top1 FROM pc),
        |c AS (
        |  SELECT rev_q,
        |    CAST(SUM(rev_q) OVER (ORDER BY rev_q DESC, o_custkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM pc)
        |SELECT COUNT(*) AS n_customers,
        |  CAST(SUM(CASE WHEN (cum - rev_q) * 5 < total * 4 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_top80,
        |  CAST(top1 * 1000000 // total AS BIGINT) AS top1_share_micro,
        |  total AS total_rev_q
        |FROM c, t GROUP BY top1, total""".stripMargin,
    "agg_gini" ->
      """WITH pc AS (
        |  SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS rev_q
        |  FROM orders GROUP BY o_custkey),
        |r AS (
        |  SELECT rev_q,
        |    CAST(ROW_NUMBER() OVER (ORDER BY rev_q ASC, o_custkey ASC) AS BIGINT) AS rank
        |  FROM pc),
        |s AS (SELECT COUNT(*) AS n, CAST(SUM(rev_q) AS BIGINT) AS sx,
        |  SUM(rank * rev_q) AS srx FROM r)
        |SELECT n AS n_customers, sx AS total_rev_q,
        |  CAST(2 * srx - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE) AS gini
        |FROM s""".stripMargin,
    "skyline_2d" ->
      """WITH pts AS (
        |  SELECT CAST(p_size AS BIGINT) AS x,
        |         MIN(CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)) AS y
        |  FROM part GROUP BY p_size)
        |SELECT x AS p_size, y AS best_price_q FROM pts p
        |WHERE NOT EXISTS (SELECT 1 FROM pts q WHERE q.x < p.x AND q.y <= p.y)
        |ORDER BY p_size""".stripMargin,
    "sample_pps" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS w
        |  FROM orders),
        |c AS (
        |  SELECT o_orderkey, w,
        |    CAST(SUM(w) OVER (ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(SUM(w) OVER () AS BIGINT) AS t
        |  FROM o)
        |SELECT o_orderkey, w,
        |  CAST(cum // GREATEST(t // 100, 1) AS BIGINT) AS bucket
        |FROM c
        |WHERE (cum // GREATEST(t // 100, 1)) > ((cum - w) // GREATEST(t // 100, 1))
        |ORDER BY o_orderkey""".stripMargin,
    "table_diff" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c1
        |  FROM orders),
        |v2 AS (
        |  SELECT k, CASE WHEN k % 10 = 3 THEN c1 + 100 ELSE c1 END AS c2
        |  FROM v1 WHERE k % 97 <> 0
        |  UNION ALL
        |  SELECT k + 10000000, c1 FROM v1 WHERE k % 101 = 5),
        |j AS (
        |  SELECT
        |    CASE WHEN c2 IS NULL THEN 'removed'
        |         WHEN c1 IS NULL THEN 'added'
        |         WHEN c1 <> c2 THEN 'changed'
        |         ELSE 'unchanged' END AS class,
        |    ABS(COALESCE(c2, 0) - COALESCE(c1, 0)) AS d
        |  FROM v1 FULL OUTER JOIN v2 USING (k))
        |SELECT class, COUNT(*) AS n, CAST(SUM(d) AS BIGINT) AS drift_q
        |FROM j GROUP BY class ORDER BY class""".stripMargin,
    "scd2_merge" ->
      """WITH dim AS (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents, c_mktsegment
        |  FROM customer),
        |upd AS (SELECT c_custkey, bal_cents + 10000 AS bal_cents_new
        |  FROM dim WHERE c_custkey % 10 = 0)
        |SELECT c_custkey, CAST(1 AS BIGINT) AS version, TRUE AS is_current, bal_cents,
        |  c_mktsegment AS segment
        |FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |UNION ALL
        |SELECT c_custkey, CAST(1 AS BIGINT), FALSE, bal_cents, c_mktsegment
        |FROM dim WHERE c_custkey IN (SELECT c_custkey FROM upd)
        |UNION ALL
        |SELECT c_custkey, CAST(2 AS BIGINT), TRUE, bal_cents_new, 'UPDATED' FROM upd
        |ORDER BY c_custkey, version""".stripMargin
  )
}
