package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Group-by aggregation surface (SURVEY §2.2 "Aggregation").
  *
  * The reference has no aggregation at all (its only pipeline is
  * source→map→sink, reference OrcSinkTest.java:32-37) — this module is the
  * query half the reference delegates to Hive, re-expressed on Catalyst.
  *
  * Scale posture: every query here is a hash aggregate with map-side
  * partial aggregation (automatic for sum/count/min/max/avg), so the
  * shuffle carries one row per (partition, group), not per input row.
  * Group cardinality is bounded (flags, nations, statuses), so these run
  * unchanged at 100 TB with AQE coalescing the post-shuffle partitions.
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped pricing summary: scan → pushed filter → hash agg.
    "agg_pricing_summary" -> { (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // INCREMENTAL MATERIALIZED AGGREGATE VIEW (graft.streaming.AggView —
    // the warehouse IVM): orders arrive as three deterministic batches
    // (o_orderkey mod 3), each folded into a per-status totals table
    // through the pointer-versioned merge protocol, WITH batch 1
    // REPLAYED mid-history — at-least-once redelivery whose additive
    // double-apply the batchId ledger must refuse. The oracle
    // recomputes the totals from the full table in one pass, so a pass
    // proves maintained ≡ recomputed INCLUDING replay immunity. All
    // maintained sums are integer cents (BIGINT end to end).
    "agg_view_maintain" -> { (spark, dir) =>
      val base = Tables
        .orders(spark, dir)
        .select(
          col("o_orderstatus").as("status"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          pmod(col("o_orderkey"), lit(3)).as("b"))
      val viewDir = java.nio.file.Files.createTempDirectory("agg_view_gate").toString
      def batch(i: Int) = base.filter(col("b") === i).drop("b")
      graft.streaming.AggView.applyBatch(spark, viewDir, 0L, batch(0), Seq("status"), Seq("cents"))
      graft.streaming.AggView.applyBatch(spark, viewDir, 1L, batch(1), Seq("status"), Seq("cents"))
      // the redelivery: same batchId — must be a structural no-op
      graft.streaming.AggView.applyBatch(spark, viewDir, 1L, batch(1), Seq("status"), Seq("cents"))
      graft.streaming.AggView.applyBatch(spark, viewDir, 2L, batch(2), Seq("status"), Seq("cents"))
      graft.streaming.AggView
        .read(spark, viewDir)
        .select(col("status"), col("n"), col("sum_cents"))
        .orderBy(col("status"))
    },

    // distinct + count-distinct (exact; shuffles on (group, distinct key)
    // first — Spark expands this to a two-phase agg automatically).
    "agg_count_distinct" -> { (spark, dir) =>
      Tables
        .orders(spark, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n_orders")
        )
        .orderBy(col("o_orderstatus"))
    },

    // ROLLUP over a broadcast dim join: customer fact, nation dim.
    "agg_rollup" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val n = Tables.nation(spark, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("n_name").asc_nulls_first)
    },

    // CUBE over two low-cardinality keys.
    "agg_cube" -> { (spark, dir) =>
      Tables
        .orders(spark, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // GROUPING SETS (Spark 4 Dataset.groupingSets).
    "agg_grouping_sets" -> { (spark, dir) =>
      Tables
        .orders(spark, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"),
          col("o_orderpriority")
        )
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // collect_set: deterministic via sort_array; the set is flattened to a
    // scalar CSV string so the driver's pandas-side hash can compare it
    // (list-typed result columns crash its sort; same trick applies to any
    // future array-valued output).
    "agg_collect_set" -> { (spark, dir) =>
      val c = Tables.customer(spark, dir)
      val n = Tables.nation(spark, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
          count(lit(1)).as("n_cust")
        )
        .orderBy(col("n_name"))
    },

    // collect_list: per-customer order-price trail, sorted for determinism
    // and flattened to a scalar string (see agg_collect_set).
    "agg_collect_list" -> { (spark, dir) =>
      Tables
        .orders(spark, dir)
        .groupBy(col("o_custkey"))
        .agg(
          array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("order_keys"),
          count(lit(1)).as("n_orders")
        )
        .orderBy(col("o_custkey"))
    },

    // HLL approximate distinct. Spark's HLL++ and any oracle's sketch
    // disagree by construction, so the declared output carries (a) the
    // exact distinct counts, hash-checked, and (b) a boolean asserting the
    // HLL estimate landed within ±5% of exact — the oracle's constant TRUE
    // only matches when the sketch behaves. Exercises the sketch path that
    // at 100 TB replaces exact count-distinct's full shuffle.
    "agg_approx_distinct" -> { (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_suppkey")).as("exact_supps"),
          approx_count_distinct(col("l_partkey")).as("__ap"),
          approx_count_distinct(col("l_suppkey")).as("__as")
        )
        .select(
          col("l_returnflag"),
          col("exact_parts"),
          col("exact_supps"),
          (abs(col("__ap") - col("exact_parts")) <= col("exact_parts") * 0.05).as("parts_within_5pct"),
          (abs(col("__as") - col("exact_supps")) <= col("exact_supps") * 0.05).as("supps_within_5pct")
        )
        .orderBy(col("l_returnflag"))
    },

    // Custom typed Aggregator[IN,BUF,OUT] (SURVEY §2.2 row "custom typed
    // agg"): exact quantity-weighted average price via integer-quantized
    // partial sums (order-independent, hence oracle-exact). Registered as
    // a udaf so it rides the normal partial/final hash-agg path.
    "agg_weighted_avg" -> { (spark, dir) =>
      val wavg = udaf(
        new graft.functions.VecAgg.WeightedAvg,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaDouble
        )
      )
      Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
          count(lit(1)).as("n")
        )
        .orderBy(col("l_returnflag"))
    },

    // Misra-Gries heavy hitters (functions.FreqItems): a fixed-size
    // MERGEABLE sketch — O(c) state per partition regardless of stream
    // length — whose guarantee (every value with true count > n/(c+1)
    // is present) is the hash-checkable output, same scheme as the
    // other approximate operators. c=2 over the lang column: threshold
    // n/3, and the fixture's dominant language (~44%) must be found.
    // The sketch CONTENT is order-dependent (legit for MG) so it is
    // never emitted — only the exact heavy-hitter count and the
    // all-found boolean, both deterministic.
    "agg_heavy_hitters" -> { (spark, dir) =>
      val d = Tables.documents(spark, dir).select(col("lang"))
      val sketch = udaf(new graft.functions.FreqItems(2), org.apache.spark.sql.Encoders.STRING)
      val sk = d.agg(sketch(col("lang")).as("sketch"))
      val total = d.agg(count(lit(1)).as("n_total"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(total))
        .filter(col("c") * 3 > col("n_total"))
        .crossJoin(broadcast(sk))
        .select(col("lang"), map_contains_key(col("sketch"), col("lang")).as("in_sketch"))
        .agg(
          count(lit(1)).as("n_heavy"),
          coalesce(bool_and(col("in_sketch")), lit(true)).as("found_ok"))
        .select(col("n_heavy"), col("found_ok"))
    },

    // The SQL spelling of both sketches: graft_freq_items /
    // graft_quantile_summary are registered SQL aggregate functions
    // (GraftExtensions.register), so a SQL-only user composes the same
    // guarantee checks in query text — heavy-hitter zero-FN above n/3
    // (c=16 ⇒ bound n/17) and the quantile certificate's 10% gate.
    "sql_sketch_agg" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      Tables.documents(spark, dir).createOrReplaceTempView("graft_docs_sk")
      spark.sql(
        """WITH sk AS (SELECT graft_freq_items(lang) AS fsk,
          |                   graft_quantile_summary(CAST(n_chars AS DOUBLE)) AS qsk
          |            FROM graft_docs_sk),
          |heavy AS (SELECT lang FROM graft_docs_sk GROUP BY lang
          |          HAVING 3 * COUNT(*) > (SELECT COUNT(*) FROM graft_docs_sk))
          |SELECT
          |  (SELECT COUNT(*) FROM heavy) AS n_heavy,
          |  (SELECT coalesce(bool_and(map_contains_key(sk.fsk, h.lang)), true)
          |   FROM heavy h CROSS JOIN sk) AS found_ok,
          |  (SELECT qsk.err * 10 <= qsk.n FROM sk) AS q_bound_ok""".stripMargin)
    },

    // DECIMAL-exact aggregation: source money columns cast to
    // DECIMAL(18,4) at the scan, summed exactly in decimal arithmetic
    // (no float quantization anywhere), final values surfaced as double
    // (a correctly-rounded conversion both engines share). This is the
    // full-decimal alternative to Exact.dsum's quantized-double scheme.
    "agg_decimal_exact" -> { (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .select(
          col("l_returnflag"),
          col("l_quantity").cast("decimal(18,4)").as("qty_d"),
          col("l_extendedprice").cast("decimal(18,4)").as("price_d")
        )
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("qty_d")).cast("double").as("sum_qty"),
          sum(col("price_d")).cast("double").as("sum_price"),
          count(lit(1)).as("n")
        )
        .orderBy(col("l_returnflag"))
    },

    // Approximate quantile (one-pass sketch — the 100 TB percentile):
    // like agg_approx_distinct, the declared output carries the exact
    // percentile plus a boolean asserting the sketch landed within 5%.
    "agg_approx_quantile" -> { (spark, dir) =>
      Tables
        .orders(spark, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("__ap50")
        )
        .select(
          col("o_orderstatus"),
          col("exact_p50"),
          (abs(col("__ap50") - col("exact_p50")) <= col("exact_p50") * 0.05).as("p50_within_5pct")
        )
        .orderBy(col("o_orderstatus"))
    },

    // Our own mergeable quantile sketch (deterministic MRL/KLL compactor
    // hierarchy, graft.functions.QuantileSketch): fixed-size state with a
    // self-carried worst-case rank-error certificate. Sketch CONTENT is
    // merge-order-dependent, so — exactly like agg_heavy_hitters — the
    // declared output is the GUARANTEE, verified against exact ranks
    // recomputed from the data: for each q, the estimate's exact rank
    // interval [count(<est), count(<=est)] must overlap ceil(q·n) ± err,
    // and the certificate itself must be tighter than 10% of n.
    "agg_quantile_sketch" -> { (spark, dir) =>
      val base = Tables.lineitem(spark, dir).select(col("l_extendedprice").cast("double").as("x"))
      val sk = udaf(new graft.functions.QuantileSketch(256), org.apache.spark.sql.Encoders.scalaDouble)
      val estimateUdf = udf((vs: Seq[Double], ws: Seq[Long], n: Long, q: Double) =>
        graft.functions.QSummary.estimate(vs, ws, n, q))
      val est = base
        .agg(sk(col("x")).as("s"))
        .select(explode(array(Seq(0.25, 0.5, 0.75, 0.95).map(lit): _*)).as("q"), col("s"))
        .select(
          col("q"),
          col("s.n").as("n"),
          col("s.err").as("err"),
          estimateUdf(col("s.values"), col("s.weights"), col("s.n"), col("q")).as("est")
        )
      base
        .crossJoin(broadcast(est))
        .groupBy(col("q"), col("n"), col("err"), col("est"))
        .agg(
          sum(when(col("x") < col("est"), 1L).otherwise(0L)).as("lo"),
          sum(when(col("x") <= col("est"), 1L).otherwise(0L)).as("hi")
        )
        .select(
          col("q"),
          (col("hi") >= ceil(col("q") * col("n")) - col("err") &&
            col("lo") <= ceil(col("q") * col("n")) + col("err") &&
            col("err") * 10L <= col("n")).as("ok")
        )
        .orderBy(col("q"))
    },

    // Exact percentiles (linear interpolation — same rank formula as the
    // oracle's quantile_cont). At 100 TB you'd use approx_percentile's
    // one-pass sketch; exact percentile is the oracle-checkable twin.
    "agg_percentiles" -> { (spark, dir) =>
      Tables
        .orders(spark, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          count(lit(1)).as("n")
        )
        .orderBy(col("o_orderstatus"))
    },

    // Statistical moments (stddev / correlation) via quantized moment
    // sums: built-in stddev/corr use Welford-style accumulation whose
    // float error differs per engine and per partitioning, so the
    // oracle-exact formulation computes Σx, Σx², Σxy with the integral-
    // double scheme and applies the closed forms once at the end.
    "agg_moments" -> { (spark, dir) =>
      val n = count(lit(1)).cast("double")
      val sx = dsum(col("l_quantity"))
      val sxx = dsum(col("l_quantity") * col("l_quantity"))
      val sy = dsum(col("l_discount"))
      val syy = dsum(col("l_discount") * col("l_discount"))
      val sxy = dsum(col("l_quantity") * col("l_discount"))
      Tables
        .lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          sqrt((sxx - sx * sx / n) / (n - 1)).as("sd_qty"),
          ((sxy - sx * sy / n) /
            sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).as("corr_qty_disc"),
          n.cast("long").as("n")
        )
        .orderBy(col("l_returnflag"))
    },

    // PIVOT: order counts + quantized revenue per priority, statuses as
    // columns (the planner compiles this to one hash agg with
    // conditional aggregates — exactly the oracle's FILTER spelling).
    "agg_pivot" -> { (spark, dir) =>
      Tables
        .orders(spark, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))
    },

    // The SQL entry point: the same engine surface via spark.sql over
    // registered temp views (proves a SQL-first user can drive it).
    // Literals are spelled 1e4/0.5e0 (doubles): in Spark SQL TEXT a bare
    // decimal literal like 10000.0 parses as DECIMAL(6,1), which would
    // plan a decimal division (decimal128 result) instead of the DOUBLE
    // the DataFrame-API twin and the DuckDB oracle produce.
    "sql_surface" -> { (spark, dir) =>
      Tables.orders(spark, dir).createOrReplaceTempView("g_orders")
      Tables.customer(spark, dir).createOrReplaceTempView("g_customer")
      spark.sql(
        """SELECT c_mktsegment,
          |  COUNT(*) AS n_orders,
          |  (SUM(FLOOR(o_totalprice * 1e4 + 0.5e0)) / 1e4) AS sum_price
          |FROM g_orders JOIN g_customer ON o_custkey = c_custkey
          |WHERE o_orderstatus = 'O'
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment""".stripMargin
      )
    },

    // min/max/avg over a high-cardinality group (per-part stats): the
    // shape where map-side partial aggregation matters most.
    "agg_minmax_per_key" -> { (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .groupBy(col("l_partkey"))
        .agg(
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n")
        )
        .orderBy(col("l_partkey"))
    },

    // Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg) —
    // the partial-aggregation distinct-count path a 100 TB rollup
    // actually runs: per-group sketches union into the global sketch
    // WITHOUT rescanning rows. Both the direct global estimate and the
    // union-of-group-sketches estimate are gated within 5% of the exact
    // ndv the oracle recomputes. (The two are NOT gated equal to each
    // other: DataSketches unions promote HLL_4 → HLL_8 internally, so
    // the union's estimate differs in low digits from the directly
    // built sketch — measured on this fixture. The accuracy contract,
    // not bit-identity, is what merging preserves.)
    "agg_hll_sketch" -> { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      val perFlag = li
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_ndv"),
          hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"),
          hll_sketch_agg(col("l_partkey")).as("sk"))
      val total = perFlag
        .agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("union_est"))
      val direct = li.agg(
        countDistinct(col("l_partkey")).as("exact_ndv"),
        hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      val flagRows = perFlag.select(
        col("l_returnflag").as("scope"),
        col("exact_ndv"),
        (abs(col("est") - col("exact_ndv")) <= col("exact_ndv") * 0.05).as("est_within_5pct"),
        lit(true).as("merge_consistent"))
      val allRow = direct
        .crossJoin(broadcast(total))
        .select(
          lit("ALL").as("scope"),
          col("exact_ndv"),
          (abs(col("est") - col("exact_ndv")) <= col("exact_ndv") * 0.05).as("est_within_5pct"),
          (abs(col("union_est") - col("exact_ndv")) <= col("exact_ndv") * 0.05)
            .as("merge_consistent"))
      flagRows.unionAll(allRow).orderBy(col("scope"))
    },

    // Ordered string aggregation (group_concat parity): names joined in
    // c_custkey order. Spark has no ordered string_agg, so the order is
    // carried by array_sort over (key, name) structs — struct arrays
    // sort lexicographically by field, making the concatenation
    // deterministic under any partitioning. Output is md5'd: the gate
    // checks CONTENT without hauling megabyte strings through the diff.
    "agg_string_agg" -> { (spark, dir) =>
      Tables
        .customer(spark, dir)
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n"),
          expr(
            "md5(concat_ws(',', transform(array_sort(collect_list(struct(c_custkey, c_name))), s -> s.c_name)))"
          ).as("names_hash"))
        .orderBy(col("c_nationkey"))
    },

    // EXACT median per group — no interpolation, no approx sketch: the
    // lower median is the value at rank (n+1) div 2 under (value, id)
    // order. Rank and count ride per-group windows (partition count =
    // group count), values ride the 1e-3 grid, so the result is
    // engine-exact. Definition is pinned on BOTH sides — DuckDB's
    // median() interpolates on even counts and would diverge.
    "agg_median_exact" -> { (spark, dir) =>
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("v_q"), col("event_id"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
      Tables
        .events(spark, dir)
        .select(
          col("event_id"), col("event_type"),
          floor(col("value") * 1000 + lit(0.5)).cast("long").as("v_q"))
        .withColumn("rk", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rk") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("v_q").as("median_q"), col("n"))
        .orderBy(col("event_type"))
    },

    // Median absolute deviation — the robust dispersion twin of
    // agg_median_exact, and a two-level composition: per-group exact
    // median (lower-middle rule, pinned on both sides), the one-row-per-
    // group result broadcast back onto the data, then the exact median
    // of |v − med| by the same rule. Integer 1e-3 grid throughout; two
    // partitioned rank windows, two metadata-scale broadcasts, no
    // collects.
    "agg_mad" -> { (spark, dir) =>
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("v_q"), col("event_id"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
      val e = Tables
        .events(spark, dir)
        .select(
          col("event_id"), col("event_type"),
          floor(col("value") * 1000 + lit(0.5)).cast("long").as("v_q"))
      val med = e
        .withColumn("rk", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rk") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("v_q").as("med"), col("n"))
      val wOrd2 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("d_q"), col("event_id"))
      e.join(broadcast(med), "event_type")
        .withColumn("d_q", abs(col("v_q") - col("med")))
        .withColumn("rk2", row_number().over(wOrd2))
        .filter(col("rk2") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("n"), col("med").as("median_q"), col("d_q").as("mad_q"))
        .orderBy(col("event_type"))
    },

    // Winsorization: clip each value to its group's exact [p05, p95]
    // rank values (ceil ranks in integer math — (5n+99) div 100 /
    // (95n+99) div 100). Bounds come from two rank filters (one row per
    // group — broadcast back); the clip itself is a map. The robust-
    // stats preprocessing step before any mean/stddev at 100 TB.
    "agg_winsorize" -> { (spark, dir) =>
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("v_q"), col("event_id"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
      val ranked = Tables
        .events(spark, dir)
        .select(
          col("event_id"), col("event_type"),
          floor(col("value") * 1000 + lit(0.5)).cast("long").as("v_q"))
        .withColumn("rk", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
      val lo = ranked.filter(col("rk") === expr("(5 * n + 99) div 100"))
        .select(col("event_type"), col("v_q").as("lo_q"))
      val hi = ranked.filter(col("rk") === expr("(95 * n + 99) div 100"))
        .select(col("event_type"), col("v_q").as("hi_q"))
      ranked
        .join(broadcast(lo), "event_type")
        .join(broadcast(hi), "event_type")
        .select(
          col("event_id"), col("event_type"), col("v_q"),
          least(greatest(col("v_q"), col("lo_q")), col("hi_q")).as("v_wins"))
        .orderBy(col("event_id"))
    },

    // EXACT distributed least squares (y = a + b·x per group): the five
    // sufficient statistics (n, Σx, Σy, Σxy, Σx²) accumulate as longs on
    // the integer-cent grid — order-free and map-side combinable — and
    // the closed form's cross products run in DECIMAL(38,0) (Spark's
    // 128-bit decimal ≙ DuckDB's HUGEINT) because n·Σxy at fixture scale
    // already exceeds int64. Only the final three expressions drop to
    // double, in identical textual order on both engines. This is the
    // "ML-adjacent" regression an analytics engine should run WITHOUT a
    // driver-side solve: one aggregation, any data size.
    "agg_linreg" -> { (spark, dir) =>
      val d38 = "decimal(38,0)"
      Tables
        .lineitem(spark, dir)
        .select(
          col("l_returnflag"),
          floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("x"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          // per-row products fit int64 (x ≤ 5e3 cents, y ≤ 1.05e7 cents)
          // but their SUMS don't at sf0.1 (Σy² ≈ 2e19 > 2^63): accumulate
          // in decimal(38,0) — Spark's 128-bit path, the same width
          // DuckDB's HUGEINT sum uses, so both engines stay exact.
          sum((col("x") * col("y")).cast(d38)).as("sxy"),
          sum((col("x") * col("x")).cast(d38)).as("sxx"),
          sum((col("y") * col("y")).cast(d38)).as("syy"))
        .select(
          col("l_returnflag"),
          col("n"),
          expr(s"cast(n as $d38) * cast(sxy as $d38) - cast(sx as $d38) * cast(sy as $d38)")
            .as("num"),
          expr(s"cast(n as $d38) * cast(sxx as $d38) - cast(sx as $d38) * cast(sx as $d38)")
            .as("den"),
          expr(s"cast(n as $d38) * cast(syy as $d38) - cast(sy as $d38) * cast(sy as $d38)")
            .as("deny"),
          col("sx"), col("sy"))
        .select(
          col("l_returnflag"),
          col("n"),
          (col("num").cast("double") / col("den").cast("double")).as("slope"),
          ((col("sy").cast("double") - (col("num").cast("double") / col("den").cast("double"))
            * col("sx").cast("double")) / col("n").cast("double")).as("intercept"),
          ((col("num").cast("double") * col("num").cast("double"))
            / (col("den").cast("double") * col("deny").cast("double"))).as("r2"))
        .orderBy(col("l_returnflag"))
    },

    // MODE (most frequent value) per group with a deterministic tiebreak
    // (smallest value wins). Two hash aggs + a per-group top-1 window —
    // the window's partition count equals the group count, so it scales
    // with the grouping key, never a global sort.
    "agg_mode" -> { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("n").desc, col("source").asc)
      Tables
        .documents(spark, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("lang"), col("source").as("mode_source"), col("n").as("n_mode"))
        .orderBy(col("lang"))
    }
  )

  private val pricingCols =
    s"""${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_extendedprice")} AS avg_price,
       |  ${sqlAvg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order""".stripMargin

  val oracles: Map[String, String] = Map(
    // The maintained view's ground truth is the one-pass recomputation:
    // identical totals through three incremental merges + a replayed
    // batch prove the maintenance protocol, not just the arithmetic.
    "agg_view_maintain" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $pricingCols
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_count_distinct" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderpriority) AS n_prio,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_rollup" ->
      s"""SELECT n_name, COUNT(*) AS n_cust, ${sqlSum("c_acctbal")} AS sum_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP(n_name)
         |ORDER BY n_name ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${sqlSum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${sqlSum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_collect_set" ->
      """SELECT n_name,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        |  COUNT(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_collect_list" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_suppkey) AS exact_supps,
        |  TRUE AS parts_within_5pct,
        |  TRUE AS supps_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_decimal_exact" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_approx_quantile" ->
      """SELECT o_orderstatus,
        |  CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS exact_p50,
        |  TRUE AS p50_within_5pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_percentiles" ->
      """SELECT o_orderstatus,
        |  CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
        |  CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_moments" -> {
      val n = "CAST(COUNT(*) AS DOUBLE)"
      val sx = sqlSum("l_quantity")
      val sxx = sqlSum("l_quantity * l_quantity")
      val sy = sqlSum("l_discount")
      val syy = sqlSum("l_discount * l_discount")
      val sxy = sqlSum("l_quantity * l_discount")
      s"""SELECT l_returnflag,
         |  sqrt(($sxx - $sx * $sx / $n) / ($n - 1)) AS sd_qty,
         |  (($sxy - $sx * $sy / $n) /
         |    sqrt(($sxx - $sx * $sx / $n) * ($syy - $sy * $sy / $n))) AS corr_qty_disc,
         |  CAST($n AS BIGINT) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sql_surface" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  (SUM(FLOOR(o_totalprice * 10000.0 + 0.5)) / 10000.0) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_weighted_avg" ->
      """SELECT l_returnflag,
        |  SUM(FLOOR(l_extendedprice * l_quantity * 10000.0 + 0.5))
        |    / SUM(FLOOR(l_quantity * 10000.0 + 0.5)) AS wavg_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_heavy_hitters" ->
      """SELECT COUNT(*) AS n_heavy, TRUE AS found_ok
        |FROM (SELECT lang FROM documents GROUP BY lang
        |      HAVING 3 * COUNT(*) > (SELECT COUNT(*) FROM documents))""".stripMargin,
    "agg_quantile_sketch" ->
      """SELECT CAST(q AS DOUBLE) AS q, TRUE AS ok
        |FROM (VALUES (0.25), (0.50), (0.75), (0.95)) t(q) ORDER BY q""".stripMargin,
    "sql_sketch_agg" ->
      """SELECT
        |  (SELECT COUNT(*) FROM (SELECT lang FROM documents GROUP BY lang
        |     HAVING 3 * COUNT(*) > (SELECT COUNT(*) FROM documents)) h) AS n_heavy,
        |  TRUE AS found_ok,
        |  TRUE AS q_bound_ok""".stripMargin,
    "agg_minmax_per_key" ->
      s"""SELECT l_partkey, MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
         |  ${sqlSum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    "agg_hll_sketch" ->
      """SELECT CAST(l_returnflag AS VARCHAR) AS scope,
        |  COUNT(DISTINCT l_partkey) AS exact_ndv,
        |  TRUE AS est_within_5pct, TRUE AS merge_consistent
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'ALL', COUNT(DISTINCT l_partkey), TRUE, TRUE FROM lineitem
        |ORDER BY scope""".stripMargin,
    "agg_string_agg" ->
      """SELECT c_nationkey, COUNT(*) AS n,
        |  md5(string_agg(c_name, ',' ORDER BY c_custkey)) AS names_hash
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "agg_median_exact" ->
      """WITH e AS (
        |  SELECT event_id, event_type, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_q
        |  FROM events),
        |r AS (SELECT event_type, v_q,
        |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v_q, event_id) AS rk,
        |  COUNT(*) OVER (PARTITION BY event_type) AS n
        |FROM e)
        |SELECT event_type, v_q AS median_q, n
        |FROM r WHERE rk = (n + 1) // 2 ORDER BY event_type""".stripMargin,
    "agg_mad" ->
      """WITH e AS (
        |  SELECT event_id, event_type, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_q
        |  FROM events),
        |r AS (SELECT event_type, v_q,
        |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v_q, event_id) AS rk,
        |  COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |med AS (SELECT event_type, v_q AS med, n FROM r WHERE rk = (n + 1) // 2),
        |d AS (
        |  SELECT e.event_type, ABS(e.v_q - med.med) AS d_q, e.event_id, med.med, med.n
        |  FROM e JOIN med USING (event_type)),
        |r2 AS (SELECT event_type, n, med, d_q,
        |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d_q, event_id) AS rk2
        |  FROM d)
        |SELECT event_type, n, med AS median_q, d_q AS mad_q
        |FROM r2 WHERE rk2 = (n + 1) // 2 ORDER BY event_type""".stripMargin,
    "agg_winsorize" ->
      """WITH e AS (
        |  SELECT event_id, event_type, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_q
        |  FROM events),
        |r AS (SELECT event_id, event_type, v_q,
        |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v_q, event_id) AS rk,
        |  COUNT(*) OVER (PARTITION BY event_type) AS n
        |FROM e),
        |lo AS (SELECT event_type, v_q AS lo_q FROM r WHERE rk = (5 * n + 99) // 100),
        |hi AS (SELECT event_type, v_q AS hi_q FROM r WHERE rk = (95 * n + 99) // 100)
        |SELECT event_id, r.event_type, v_q,
        |  least(greatest(v_q, lo_q), hi_q) AS v_wins
        |FROM r JOIN lo ON r.event_type = lo.event_type
        |       JOIN hi ON r.event_type = hi.event_type
        |ORDER BY event_id""".stripMargin,
    "agg_linreg" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS x,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
        |  FROM b GROUP BY l_returnflag),
        |c AS (
        |  SELECT l_returnflag, n,
        |    n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS den,
        |    n * syy - sy * sy AS deny,
        |    sx, sy
        |  FROM s)
        |SELECT l_returnflag, n,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope,
        |  (CAST(sy AS DOUBLE) - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
        |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
        |  (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
        |    / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) AS r2
        |FROM c ORDER BY l_returnflag""".stripMargin,
    "agg_mode" ->
      """WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source),
        |r AS (SELECT lang, source, n,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, source ASC) AS rn FROM c)
        |SELECT lang, source AS mode_source, n AS n_mode
        |FROM r WHERE rn = 1 ORDER BY lang""".stripMargin
  )
}
