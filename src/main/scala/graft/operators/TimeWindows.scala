package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Event-time window aggregation (SURVEY §2.2 "Streaming" rows 37-41) —
  * batch twins of the streaming operators, oracle-checked on `events`.
  *
  * The same `window()`/`session_window()` expressions run unchanged under
  * `readStream` (StreamingSemanticsSpec exercises that path with
  * watermarks, late data, and state eviction); batch execution gives the
  * DuckDB-comparable ground truth for the window assignment itself —
  * Spark's time buckets vs `time_bucket`, session merge semantics vs a
  * gaps-and-islands rewrite.
  *
  * Scale posture: tumbling/sliding windows are plain hash aggs on
  * (bucket, key) — map-side partials, bounded shuffle (sliding emits
  * size/slide rows per event, here 2×). Session windows shuffle by user
  * then sort-merge within partitions — same cost class as any
  * per-key window.
  */
object TimeWindows {
  type Q = (SparkSession, String) => DataFrame

  /** Per-user journey cap for [[cappedJourneys]] — the explicit bound
    * that keeps the pattern-match collect out of the unbounded-per-key
    * class (the `StreamingTopPaths.maxPathEvents` precedent). 512 events
    * dwarfs any fixture user's history, so the cap is a SAFETY bound at
    * the gated scales and the binding bound only on pathological keys. */
  val MaxJourneyEvents: Int = 512

  /** Per-user event-symbol journeys, BOUNDED: the first `cap` events per
    * user in (ts, event_id) order become the ordered symbol string. The
    * cap makes the per-key collect O(cap) instead of O(user history) —
    * at 100 TB a power user (or a bot) cannot balloon one key's state;
    * rows past the cap are dropped deterministically, mirrored verbatim
    * in the DuckDB oracle. `n_events` counts the CAPPED journey (what
    * the regexes see), not the raw history. The row_number rides the
    * same user_id shuffle the groupBy needs — no extra exchange. */
  private[graft] def cappedJourneys(events: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(
        col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("sym"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("concat_ws('', transform(array_sort(collect_list(struct(ts, event_id, sym))), s -> s.sym))")
          .as("j"))
  }

  val queries: Map[String, Q] = Map(
    // Tumbling 1-hour windows per event type.
    "win_tumbling" -> { (spark, dir) =>
      Tables
        .events(spark, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("ws"), col("event_type"))
    },

    // Sliding windows: 1 hour size, 30 minute slide (each event lands in
    // exactly 2 windows).
    "win_sliding" -> { (spark, dir) =>
      Tables
        .events(spark, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .select(col("w.start").as("ws"), col("n"), col("n_users"))
        .orderBy(col("ws"))
    },

    // Session windows per user, 5-minute gap. Boundary semantics,
    // verified empirically (StreamingTopPathsSpec pins it): Spark
    // MERGES touching sessions — an event at exactly prev_ts + gap
    // still extends the session; only a STRICTLY larger gap splits.
    // The oracle's island rewrite therefore splits on `> INTERVAL`,
    // not `>=`.
    "win_session" -> { (spark, dir) =>
      Tables
        .events(spark, dir)
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"), col("w.end").as("session_end"), col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Keyed dedup (batch twin of streaming dropDuplicates): deterministic
    // representative via min, not "first seen".
    "dedup_keyed" -> { (spark, dir) =>
      Tables
        .events(spark, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n_dups"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // Ordered FUNNEL analysis (view → click → purchase): a user advances
    // a stage only with an event AT OR AFTER their previous stage's
    // first event — sequence matters, not mere presence. Three chained
    // per-user window minima over the SAME partitioning: one shuffle on
    // user_id, the sequential dependency rides chained selects (each
    // window may reference the previous stage's timestamp), then a
    // single global count row. No joins, no per-user collect.
    "evt_funnel" -> { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      Tables
        .events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("v_ts", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn(
          "c_ts",
          min(when(col("event_type") === "click" && col("ts") >= col("v_ts"), col("ts"))).over(w))
        .withColumn(
          "p_ts",
          min(when(col("event_type") === "purchase" && col("ts") >= col("c_ts"), col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(min(col("v_ts")).as("v"), min(col("c_ts")).as("c"), min(col("p_ts")).as("p"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("v")).as("n_view"),
          count(col("c")).as("n_view_click"),
          count(col("p")).as("n_full_funnel"))
    },

    // Per-user outlier flagging (|z| > 2) with NO floating-point boundary:
    // quantize value to a 1e-3 grid, then clear denominators —
    // (v−mean)² > 4·var  ⇔  (n·v_q − s_q)² > 4·(n·q_q − s_q²) — so the
    // flag is pure BIGINT arithmetic (bounds: n≈70 events/user,
    // v_q ≤ 5.7e5 ⇒ every product ≤ ~1.4e15 « 2^63). One shuffle on
    // user_id carries the three moment windows; only outliers are
    // emitted, so output is a tiny fraction of input at any scale.
    "evt_anomaly" -> { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      Tables
        .events(spark, dir)
        .select(
          col("event_id"),
          col("user_id"),
          floor(col("value") * 1000 + lit(0.5)).cast("long").as("v_q"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum(col("v_q")).over(w))
        .withColumn("q", sum(col("v_q") * col("v_q")).over(w))
        .filter(
          col("n") >= 10 &&
            (col("n") * col("v_q") - col("s")) * (col("n") * col("v_q") - col("s")) >
              lit(4L) * (col("n") * col("q") - col("s") * col("s")))
        .select(col("event_id"), col("user_id"), col("v_q"), col("n").as("n_user_events"))
        .orderBy(col("event_id"))
    },

    // CALENDAR day-over-day change on the daily value series: previous
    // day joined by DATE (d−1), not by row adjacency — a partitioned
    // equi-join at any calendar span, so the fleet-wide no-global-window
    // audit holds with no exception (a LAG over the day series would be
    // the one unpartitioned window in the engine; the join is also the
    // more honest semantic — a missing day yields NULL, not a silent
    // skip). Deltas and percent change in exact integer micro-units;
    // `div` truncates toward zero exactly like DuckDB's `//` on negative
    // deltas (DivSemanticsSpec pins that).
    "evt_dod_change" -> { (spark, dir) =>
      val daily = Tables
        .events(spark, dir)
        .select(to_date(col("ts")).as("d"), floor(col("value") * 1000 + lit(0.5)).cast("long").as("v_q"))
        .groupBy(col("d"))
        .agg(sum(col("v_q")).as("day_q"), count(lit(1)).as("n_events"))
      daily
        .join(
          daily.select(col("d").as("pd"), col("day_q").as("prev_q")),
          date_sub(col("d"), 1) === col("pd"),
          "left")
        .select(
          col("d"), col("n_events"), col("day_q"), col("prev_q"),
          expr("CASE WHEN prev_q IS NULL THEN NULL ELSE (day_q - prev_q) * 1000000 div prev_q END")
            .as("pct_change_micro"))
        .orderBy(col("d"))
    },

    // TOP SESSION PATHS: the most common within-session event-type
    // sequences (product-analytics path mining). Sessions are the same
    // 5-minute-gap windows as win_session; the path string is the
    // ts-ordered (event_id tiebreak) concatenation of event types,
    // carried by array_sort over (ts, event_id, type) structs — struct
    // arrays sort lexicographically by field, so the path is
    // deterministic under any partitioning (the agg_string_agg trick).
    // One user_id shuffle for sessionization, one hash agg on the path.
    "evt_top_paths" -> { (spark, dir) =>
      Tables
        .events(spark, dir)
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(
          expr(
            "concat_ws('>', transform(array_sort(collect_list(struct(ts, event_id, event_type))), s -> s.event_type))"
          ).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(15)
    },

    // CEP-LITE EVENT PATTERN MATCHING (the SQL:2016 MATCH_RECOGNIZE /
    // Flink-CEP shape — the reference's own ecosystem spells this as a
    // CEP pattern over the stream): each user's full event history
    // becomes an ordered SYMBOL STRING (first letter of the event type
    // — the five fixture types are first-letter distinct) and sequence
    // patterns become REGEXES over it: the conversion funnel "view,
    // then anything but a purchase, then purchase" is v[^p]*p, an
    // error burst is ee+. Leftmost non-overlapping greedy semantics are
    // identical in Java regex and RE2, so match COUNTS are
    // cross-engine exact. Shape: [[cappedJourneys]] — one groupBy-user
    // with an ordered collect EXPLICITLY BOUNDED at MaxJourneyEvents
    // (row_number riding the same user_id shuffle), then pure per-row
    // regex — no second shuffle and no unbounded per-key state. The cap
    // is mirrored verbatim in the oracle.
    "evt_pattern_match" -> { (spark, dir) =>
      cappedJourneys(Tables.events(spark, dir), MaxJourneyEvents)
        .select(
          col("user_id"),
          col("n_events"),
          regexp_count(col("j"), lit("v[^p]*p")).cast("long").as("n_funnel_matches"),
          (regexp_count(col("j"), lit("ee+")) > 0).as("error_burst"))
        .orderBy(col("user_id"))
    },

    // RFM SEGMENTATION (recency / frequency / monetary): per-user metrics
    // → three SQL-exact quintile scores → segment cells. Each quintile is
    // a GLOBAL ranking over the user table, so each rides
    // DistributedRank.withGlobalNtile (SQL NTILE sizing, two-pass, no
    // single-partition window) with a user_id tiebreak for total order.
    // Recency anchors on the global max event time — deterministic, no
    // wall clock.
    "evt_rfm" -> { (spark, dir) =>
      val ev = Tables
        .events(spark, dir)
        .select(
          col("user_id"), col("ts"),
          floor(col("value") * 1000 + lit(0.5)).cast("long").as("v_q"))
      val anchor = ev.agg(max(col("ts")).as("amax"))
      val perUser = ev
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("umax"), count(lit(1)).as("freq"), sum(col("v_q")).as("mon_q"))
        .crossJoin(broadcast(anchor))
        .select(
          col("user_id"),
          datediff(to_date(col("amax")), to_date(col("umax"))).cast("long").as("recency_days"),
          col("freq"), col("mon_q"))
      // ONE ranged pass for all three quintiles (r19 — r18 ran three
      // independent withGlobalNtile calls off the checkpointed base;
      // each paid its own range-boundary SAMPLING job, range exchange,
      // offsets window, and user_id join-back — the VERDICT's "evt_rfm
      // samples three times" item). Stacking the metrics as (metric,
      // value) rows turns the three global rankings into ONE per-key
      // ranking range-partitioned on (metric, value, user_id): same
      // total order per metric, one sampling pass, one exchange of 3N
      // skinny rows, then the SQL-NTILE piecewise sizing applied to the
      // per-metric rank (T = user count — the checkpointed base makes
      // the count metadata-cheap) and a single pivot + join-back.
      val base = perUser.localCheckpoint()
      val nUsers = base.count()
      val stacked = base.select(
        col("user_id"),
        explode(array(
          struct(lit("r").as("metric"), col("recency_days").as("value")),
          struct(lit("f").as("metric"), col("freq").as("value")),
          struct(lit("m").as("metric"), col("mon_q").as("value"))
        )).as("mv"))
        .select(col("user_id"), col("mv.metric").as("metric"), col("mv.value").as("value"))
      val ranked = DistributedRank.withPerKeyRank(
        stacked, "metric",
        Seq(col("metric").asc, col("value").asc, col("user_id").asc), "__rk")
      // SQL NTILE sizing (withGlobalNtile's piecewise formula verbatim,
      // with the shared total inlined — every user has all three metrics)
      val q = nUsers / 5
      val rr = nUsers % 5
      // integer `div` (Column./ is double division); CASE short-circuits
      // the q = 0 branch exactly as in withGlobalNtile
      val score = expr(
        s"""CAST(CASE WHEN __rk <= $rr * ($q + 1)
           |  THEN (__rk - 1) div ($q + 1) + 1
           |  ELSE $rr + (__rk - 1 - $rr * ($q + 1)) div $q + 1
           |END AS BIGINT)""".stripMargin)
      val scores = ranked
        .select(col("user_id"), col("metric"), score.as("score"))
        .groupBy(col("user_id"))
        .agg(
          max(when(col("metric") === "r", col("score"))).as("r_score"),
          max(when(col("metric") === "f", col("score"))).as("f_score"),
          max(when(col("metric") === "m", col("score"))).as("m_score"))
      base
        .join(scores, Seq("user_id"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"), sum(col("mon_q")).as("sum_mon_q"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    },

    // First-order MARKOV transition matrix over per-user event sequences
    // — the sequence-modeling summary (what follows what, how often) with
    // ZERO floating point: transition probabilities are reported in
    // integer micro-units via floor(c·1e6 / total). One user_id shuffle
    // for the lead() window, one hash agg on (from, to).
    "evt_markov" -> { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables
        .events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("c"))
        .withColumn(
          "total",
          sum(col("c")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))))
        .select(
          col("from_type"), col("to_type"), col("c"),
          expr("c * 1000000 div total").as("p_micro"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Last-touch attribution: every purchase credits the event
    // immediately preceding it in the user's timeline — the marketing /
    // conversion-analysis staple. One user-partitioned lag window (the
    // same single shuffle as evt_markov), then a tiny agg keyed by the
    // credited type: purchases attributed, cent-exact revenue mass.
    // First-touch or window-capped variants are the same plan with a
    // different window frame.
    "evt_attribution" -> { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables
        .events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("v_q"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("event_type") === "purchase" && col("prev_type").isNotNull)
        .groupBy(col("prev_type"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("v_q")).as("rev_q"))
        .orderBy(col("prev_type"))
    },

    // Exact exponential smoothing (EWMA, α = 1/8) per user, in the
    // CHUNKED-RENORMALIZATION form (see operators/Ewma.scala for the
    // full why): the per-event truncating recurrence is irreducibly
    // sequential per key (nested floors don't compose, and the state
    // never provably forgets), so the operator's algebra truncates once
    // per 32-event chunk instead — exact BigInt within a chunk, which
    // turns the O(n) weighted-sum work into a hash-parallel
    // (key, chunk) groupBy (a hot key spreads across tasks) and leaves
    // only an O(n/32) O(1)-state fold per key. The oracle is generated
    // from the same BigInt constants (HUGEINT weight tables + a
    // chunk-level recursive CTE), so both engines compute the identical
    // algebra. Still the batch twin of a mapGroupsWithState streaming
    // fold (state = s + the partial chunk).
    // The SQL spelling: graft_ewma TABLE FUNCTION over a pre-gridded
    // view — a SQL-only user reaches the same hot-key-parallel chunked
    // plan. Shares evt_ewma's oracle BY REFERENCE (same contract,
    // divergence impossible).
    "sql_ewma" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      Tables
        .events(spark, dir)
        .select(
          col("user_id"),
          expr("unix_micros(ts)").as("us"),
          col("event_id"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("x"))
        .createOrReplaceTempView("graft_events_grid")
      spark.sql(
        """SELECT user_id, n_events, ewma_q
          |FROM graft_ewma('graft_events_grid', 'user_id', 'us', 'event_id', 'x')
          |ORDER BY user_id""".stripMargin)
    },

    "evt_ewma" -> { (spark, dir) =>
      Ewma
        .ewmaByKey(
          Tables
            .events(spark, dir)
            .select(
              col("user_id"),
              expr("unix_micros(ts)").as("us"),
              col("event_id"),
              floor(col("value") * 100 + lit(0.5)).cast("long").as("x")),
          "user_id", "us", "event_id", "x")
        .orderBy(col("user_id"))
    },

    // Time-series GAP FILLING: a dense (hour × event_type) grid over the
    // observed span, zero-filled where no events landed — the step that
    // makes downstream window math see missing buckets instead of
    // silently skipping them. The grid is generated from a one-row
    // bounds agg (metadata-scale, broadcast), so grid size is
    // span × type-cardinality regardless of event count.
    "evt_gapfill" -> { (spark, dir) =>
      val ev = Tables
        .events(spark, dir)
        .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      val counts = ev.groupBy(col("h"), col("event_type")).agg(count(lit(1)).as("n0"))
      val bounds = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      val hours = bounds
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
      val types = ev.select(col("event_type")).distinct()
      hours
        .crossJoin(broadcast(types))
        .join(counts, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"), coalesce(col("n0"), lit(0L)).as("n"))
        .orderBy(col("h"), col("event_type"))
    },

    // Peak CONCURRENCY via the classic sweep line: each event opens a
    // 5-minute interval; +1/−1 boundary points, sorted globally by
    // (time, delta, id) — ends before starts at a shared instant, so
    // intervals are half-open — and the running sum of deltas is the
    // live-interval count. The global running sum is
    // DistributedRank.withGlobalCumSum (two-pass, range-partitioned):
    // the sweep line, usually the textbook "needs one sorted pass"
    // operator, distributes exactly as far as a sampled sort does.
    "evt_concurrency" -> { (spark, dir) =>
      val ev = Tables
        .events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      val pts = ev
        .select(col("event_id"), col("us").as("t"), lit(1L).as("delta"))
        .unionAll(
          ev.select(col("event_id"), (col("us") + 300000000L).as("t"), lit(-1L).as("delta")))
      val swept = DistributedRank.withGlobalCumSum(
        pts, "delta", Seq(col("t"), col("delta"), col("event_id")), cumCol = "conc")
      val peak = swept.agg(max(col("conc")).as("peak"))
      swept
        .crossJoin(broadcast(peak))
        .filter(col("conc") === col("peak"))
        .groupBy(col("peak"))
        .agg(min(col("t")).as("peak_at_us"))
        .select(col("peak").as("peak_concurrency"), col("peak_at_us"))
    },

    // Cohort RETENTION: users grouped by the date of their first event
    // (the cohort); for each (cohort, day-offset) cell, how many of that
    // cohort's users were active. Per-user first-date is one window over
    // the user partitioning; the (cohort, offset, user) distinct and the
    // count are hash aggs — the standard two-shuffle retention shape at
    // any scale.
    "evt_retention" -> { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      Tables
        .events(spark, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .withColumn("cohort", min(col("d")).over(w))
        .select(col("cohort"), datediff(col("d"), col("cohort")).cast("long").as("offset_days"), col("user_id"))
        .distinct()
        .groupBy(col("cohort"), col("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort"), col("offset_days"))
    }
  )

  val oracles: Map[String, String] = Map(
    "win_tumbling" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
         |  COUNT(*) AS n, ${sqlSum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "win_sliding" ->
      """WITH assigned AS (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
        |         user_id
        |  FROM events)
        |SELECT ws, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM assigned GROUP BY ws ORDER BY ws""".stripMargin,
    "win_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    -- STRICTLY greater: Spark's session_window MERGES touching
        |    -- windows (an event at exactly lastTs+gap extends the
        |    -- session), so the split condition is > gap, not >=
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL '5 minutes'
        |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL '5 minutes' AS session_end,
        |  COUNT(*) AS n_events
        |FROM islands GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "dedup_keyed" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_event, COUNT(*) AS n_dups
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "evt_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS v_ts
        |  FROM events),
        |s2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= v_ts THEN ts END)
        |    OVER (PARTITION BY user_id) AS c_ts
        |  FROM s1),
        |s3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= c_ts THEN ts END)
        |    OVER (PARTITION BY user_id) AS p_ts
        |  FROM s2),
        |per_user AS (
        |  SELECT user_id, MIN(v_ts) AS v, MIN(c_ts) AS c, MIN(p_ts) AS p
        |  FROM s3 GROUP BY user_id)
        |SELECT COUNT(*) AS n_users, COUNT(v) AS n_view,
        |  COUNT(c) AS n_view_click, COUNT(p) AS n_full_funnel
        |FROM per_user""".stripMargin,
    "evt_anomaly" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_q
        |  FROM events),
        |a AS (
        |  SELECT user_id, COUNT(*) AS n, SUM(v_q) AS s, SUM(v_q * v_q) AS q
        |  FROM e GROUP BY user_id)
        |SELECT event_id, e.user_id, v_q, n AS n_user_events
        |FROM e JOIN a USING (user_id)
        |WHERE n >= 10 AND (n*v_q - s)*(n*v_q - s) > 4*(n*q - s*s)
        |ORDER BY event_id""".stripMargin,
    "evt_dod_change" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS day_q,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1),
        |l AS (
        |  SELECT a.d, a.n_events, a.day_q, b.day_q AS prev_q
        |  FROM d a LEFT JOIN d b ON a.d - 1 = b.d)
        |SELECT d, n_events, day_q, prev_q,
        |  CASE WHEN prev_q IS NULL THEN NULL
        |       ELSE CAST((day_q - prev_q) * 1000000 // prev_q AS BIGINT) END AS pct_change_micro
        |FROM l ORDER BY d""".stripMargin,
    // Pattern-match ground truth: the same ordered symbol string
    // (string_agg ORDER BY ts, event_id), the same per-user journey cap
    // (ROW_NUMBER <= MaxJourneyEvents), and the same regexes — Java
    // regex and RE2 agree on leftmost non-overlapping greedy counts.
    "evt_pattern_match" ->
      s"""WITH capped AS (
        |  SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS sym,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |j AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    string_agg(sym, '' ORDER BY ts, event_id) AS jn
        |  FROM capped WHERE rn <= ${MaxJourneyEvents} GROUP BY user_id)
        |SELECT user_id, n_events,
        |  CAST(len(regexp_extract_all(jn, 'v[^p]*p')) AS BIGINT) AS n_funnel_matches,
        |  (len(regexp_extract_all(jn, 'ee+')) > 0) AS error_burst
        |FROM j ORDER BY user_id""".stripMargin,
    "evt_top_paths" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    -- STRICTLY greater: Spark's session_window MERGES touching
        |    -- windows (an event at exactly lastTs+gap extends the
        |    -- session), so the split condition is > gap, not >=
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL '5 minutes'
        |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |islands AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked),
        |paths AS (
        |  SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM islands GROUP BY user_id, sid)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM paths GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 15""".stripMargin,
    "evt_rfm" ->
      """WITH e AS (
        |  SELECT user_id, ts, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_q FROM events),
        |a AS (SELECT MAX(ts) AS amax FROM e),
        |u AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(MAX(ts) AS DATE), CAST(ANY_VALUE(amax) AS DATE)) AS BIGINT)
        |      AS recency_days,
        |    COUNT(*) AS freq, CAST(SUM(v_q) AS BIGINT) AS mon_q
        |  FROM e, a GROUP BY user_id),
        |s AS (
        |  SELECT user_id, mon_q,
        |    CAST(NTILE(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS BIGINT) AS r_score,
        |    CAST(NTILE(5) OVER (ORDER BY freq ASC, user_id ASC) AS BIGINT) AS f_score,
        |    CAST(NTILE(5) OVER (ORDER BY mon_q ASC, user_id ASC) AS BIGINT) AS m_score
        |  FROM u)
        |SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
        |  CAST(SUM(mon_q) AS BIGINT) AS sum_mon_q
        |FROM s GROUP BY r_score, f_score, m_score
        |ORDER BY r_score, f_score, m_score""".stripMargin,
    "evt_markov" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |t AS (SELECT from_type, to_type, COUNT(*) AS c
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, SUM(c) AS total FROM t GROUP BY from_type)
        |SELECT t.from_type, t.to_type, c, CAST(c * 1000000 // total AS BIGINT) AS p_micro
        |FROM t JOIN tot ON t.from_type = tot.from_type
        |ORDER BY t.from_type, t.to_type""".stripMargin,
    "evt_attribution" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_q,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, COUNT(*) AS n_purchases, CAST(SUM(v_q) AS BIGINT) AS rev_q
        |FROM s WHERE event_type = 'purchase' AND prev_type IS NOT NULL
        |GROUP BY prev_type ORDER BY prev_type""".stripMargin,
    "evt_ewma" ->
      Ewma.oracleSql("events", "user_id", "ts", "event_id", "FLOOR(value * 100 + 0.5)"),
    // sql_ewma shares evt_ewma's generated oracle BY REFERENCE — the TVF
    // spelling must match the Scala operator exactly.
    "sql_ewma" ->
      Ewma.oracleSql("events", "user_id", "ts", "event_id", "FLOOR(value * 100 + 0.5)"),
    "evt_gapfill" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        |  FROM events),
        |hrs AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS h FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n0
        |  FROM events GROUP BY 1, 2)
        |SELECT hrs.h AS h, ty.event_type, COALESCE(c.n0, 0) AS n
        |FROM hrs CROSS JOIN ty
        |LEFT JOIN c ON c.h = hrs.h AND c.event_type = ty.event_type
        |ORDER BY hrs.h, ty.event_type""".stripMargin,
    "evt_concurrency" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
        |pts AS (
        |  SELECT event_id, us AS t, CAST(1 AS BIGINT) AS delta FROM e
        |  UNION ALL
        |  SELECT event_id, us + 300000000, CAST(-1 AS BIGINT) FROM e),
        |sw AS (SELECT t, SUM(delta) OVER (ORDER BY t, delta, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM pts),
        |p AS (SELECT MAX(conc) AS peak FROM sw)
        |SELECT CAST(p.peak AS BIGINT) AS peak_concurrency, MIN(sw.t) AS peak_at_us
        |FROM sw, p WHERE sw.conc = p.peak GROUP BY p.peak""".stripMargin,
    "evt_retention" ->
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort
        |  FROM events),
        |cells AS (
        |  SELECT DISTINCT cohort, CAST(date_diff('day', cohort, d) AS BIGINT) AS offset_days,
        |    user_id
        |  FROM d)
        |SELECT cohort, offset_days, COUNT(DISTINCT user_id) AS n_active
        |FROM cells GROUP BY cohort, offset_days
        |ORDER BY cohort, offset_days""".stripMargin
  )
}
