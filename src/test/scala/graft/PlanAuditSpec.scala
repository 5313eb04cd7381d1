package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the scale claims in the operator scaladocs,
  * pinned as assertions so a regression (lost pushdown, broadcast
  * downgraded to shuffle, a global window reappearing on the data path)
  * fails CI instead of surfacing at 100 TB.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def executed(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  /** Collect across AQE boundaries: AdaptiveSparkPlanExec.executedPlan and
    * materialized QueryStageExec subplans are not children in the normal
    * tree traversal, so recurse into them explicitly. */
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case q: QueryStageExec        => q.plan
    }
    here ++ nested.flatMap(collectAll(_)(pf))
  }

  test("filters reach the parquet scan (PushedFilters) for filtered scans") {
    for (q <- Seq("agg_pricing_summary", "pred_filters")) {
      val scans = collectAll(executed(q)) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata.getOrElse("PushedFilters", "[]")
      }
      assert(scans.exists(s => s != "[]" && s.nonEmpty), s"$q: no pushed filters in any scan")
    }
  }

  test("orc_bucketer_roundtrip prunes bucket dirs on the DERIVED bucket column") {
    val scans = collectAll(executed("orc_bucketer_roundtrip")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(
      scans.exists(_.partitionFilters.exists(_.references.exists(_.name == "bucket"))),
      "no scan carries a partition filter on the derived bucket column — " +
        "the expression-bucketer layout is not being pruned")
  }

  test("analytics_q2min's correlated scalar subquery decorrelates into aggregate + join") {
    val p = executed("analytics_q2min")
    // Catalyst must have rewritten the per-row subquery: no scalar
    // subquery survives to execution, and the min-price side appears as
    // a joined aggregate (>= 2 joins: li⋈minagg and ⋈supplier).
    assert(!p.toString.contains("ScalarSubquery"),
      "a per-row scalar subquery survived to the physical plan")
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size >= 2, s"expected the decorrelated aggregate+join shape, got ${joins.size} joins")
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.nonEmpty, "no aggregate in the plan — the MIN subquery was not decorrelated")
  }

  test("analytics_q4exists decorrelates the EXISTS into a left-semi join") {
    val p = executed("analytics_q4exists")
    assert(!p.toString.contains("Subquery") || !p.toString.contains("exists"),
      "a per-row EXISTS subquery survived to the physical plan")
    val semis = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty, "no LeftSemi join — the EXISTS was not decorrelated")
    // the date-window filter must reach the orders scan, not sit post-join
    val pushed = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "[]")
    }
    assert(pushed.exists(_.contains("o_orderdate")),
      s"date window not pushed to the orders scan: $pushed")
  }

  test("analytics_q17avg decorrelates the aggregate-in-predicate into aggregate + join") {
    val p = executed("analytics_q17avg")
    assert(!p.toString.contains("ScalarSubquery"),
      "a per-row scalar subquery survived to the physical plan")
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.size >= 2,
      s"expected part⋈lineitem plus the decorrelated avg join, got ${joins.size} joins")
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.exists(_.references.exists(_.name.contains("l_partkey"))) => a
    }
    assert(aggs.nonEmpty,
      "no per-partkey aggregate in the plan — the correlated AVG was not decorrelated")
  }

  test("analytics_q20nested peels both correlation levels: left-semi over a joined aggregate") {
    val p = executed("analytics_q20nested")
    assert(!p.toString.contains("ScalarSubquery"),
      "the nested correlated scalar survived to the physical plan")
    val types = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType
    }
    assert(types.contains(org.apache.spark.sql.catalyst.plans.LeftSemi),
      s"no LeftSemi in $types — the IN was not decorrelated")
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.exists(_.references.exists(_.name.contains("l_partkey"))) => a
    }
    assert(aggs.nonEmpty,
      "no per-partkey aggregate in the plan — the inner scalar was not decorrelated")
  }

  test("analytics_q21multi plans BOTH a left-semi and a left-anti against lineitem") {
    val p = executed("analytics_q21multi")
    val types = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType
    }
    assert(types.contains(org.apache.spark.sql.catalyst.plans.LeftSemi),
      s"no LeftSemi in $types — the EXISTS was not decorrelated")
    assert(types.contains(org.apache.spark.sql.catalyst.plans.LeftAnti),
      s"no LeftAnti in $types — the NOT EXISTS was not decorrelated")
  }

  test("analytics_q22notin plans a NULL-AWARE anti join for the nullable NOT IN") {
    val p = executed("analytics_q22notin")
    // Spark's null-aware single-column anti join is a BroadcastHashJoin
    // with isNullAwareAntiJoin=true (BroadcastNestedLoop when that
    // optimization is disabled) — a PLAIN LeftAnti would silently drop
    // the three-valued-logic semantics (wrong under an inner NULL)
    val naaj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.isNullAwareAntiJoin => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(naaj.nonEmpty,
      "no null-aware anti join in the physical plan — NOT IN on a nullable key " +
        "was downgraded to a plain anti join (wrong under an inner NULL)")
  }

  test("analytics_q6 is scan-only: all three predicates pushed, no join") {
    val p = executed("analytics_q6")
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"Q6 must be a pure scan+agg, found ${joins.size} joins")
    val pushed = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "[]")
    }
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.exists(_.contains(c)), s"$c not pushed to the lineitem scan: $pushed")
    // projection pruned to exactly the columns the query touches — at
    // 100 TB Q6 is scan bandwidth, so an extra column IS the regression
    val read = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("ReadSchema", "")
    }
    assert(read.exists(s =>
      s.contains("l_extendedprice") && !s.contains("l_orderkey") && !s.contains("l_returnflag")),
      s"Q6 scan reads more than its 4 columns: $read")
  }

  test("analytics_q16's NOT EXISTS exclusion stays a PLAIN anti join (contrast to q22)") {
    val p = executed("analytics_q16")
    val antis = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antis.nonEmpty, "no LeftAnti join — the NOT EXISTS was not decorrelated")
    // the exclusion is deliberately spelled NOT EXISTS (not NOT IN), so
    // paying the null-aware broadcast machinery here would be the regression
    val naaj = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.isNullAwareAntiJoin => j
    }
    assert(naaj.isEmpty,
      "NOT IN on a non-nullable key planned the null-aware anti join — " +
        "three-valued-logic machinery paid for nothing")
  }

  test("analytics_q18's IN-over-grouped-HAVING plans a left-semi against an aggregate") {
    val p = executed("analytics_q18")
    val types = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType
    }
    assert(types.contains(org.apache.spark.sql.catalyst.plans.LeftSemi),
      s"no LeftSemi in $types — the IN was not decorrelated")
    val aggs = collectAll(p) {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.exists(_.references.exists(_.name.contains("l_orderkey"))) => a
    }
    assert(aggs.nonEmpty,
      "no per-orderkey aggregate in the plan — the HAVING body was not planned as an aggregate")
  }

  test("analytics_q19's OR-of-ANDs leaves pushed filters on BOTH join sides") {
    // the canonical Q19 trap: the disjunction spans the join, but each
    // side's residue (brand/size on part, quantity on lineitem) must
    // still reach its scan — losing it means a full-fact scan at 100 TB
    val pushed = collectAll(executed("analytics_q19")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "[]")
    }
    assert(pushed.exists(_.contains("p_brand")),
      s"part side lost its brand/size residue pushdown: $pushed")
    assert(pushed.exists(_.contains("l_quantity")),
      s"lineitem side lost its quantity-envelope residue pushdown: $pushed")
  }

  test("text_phrase_search_idx pushes each term filter into the postings scan") {
    // the persisted phrase index's whole point: each phrase leg reads
    // only its term's (pruned) posting rows — the term equality must
    // reach the parquet scan, not sit post-scan
    val pushed = collectAll(executed("text_phrase_search_idx")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("postings_idx")) =>
        f.metadata.getOrElse("PushedFilters", "[]")
    }
    assert(pushed.nonEmpty, "no scan over the postings index found")
    assert(pushed.forall(_.contains("EqualTo(term")),
      s"phrase legs lost the term pushdown: $pushed")
  }

  test("text_bm25: every postings leg in the ranked plan is term-pruned; stats read is IsNull-pruned") {
    // BM25's scale contract (r17 shape): the per-doc length rides
    // DENORMALIZED on the posting rows, so the ranked plan joins NO
    // un-term-filtered postings leg — EVERY index scan in the final
    // plan must carry the query-term pushdown (the r16 plan re-joined
    // the tf leg against a corpus-wide doclen exchange here). The
    // N/avgdl corpus statistics run as a SIDE aggregate during query
    // construction; a listener capture pins that ITS scan prunes to the
    // NULL-term rows via null_count stats. The corpus itself is never
    // scanned either way.
    val side = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = side.synchronized {
        collectAll(qe.executedPlan) {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.contains("postings_bm25")) =>
            side += f.metadata.getOrElse("PushedFilters", "[]"): Unit
        }: Unit
      }
      override def onFailure(
          funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val pushed =
      try {
        val p = collectAll(executed("text_bm25")) {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.contains("postings_bm25")) =>
            f.metadata.getOrElse("PushedFilters", "[]")
        }
        // drain the async listener bus: wait until the capture is quiet
        var last = -1
        var cur = side.synchronized(side.size)
        val deadline = System.currentTimeMillis() + 15000
        while (cur != last && System.currentTimeMillis() < deadline) {
          last = cur; Thread.sleep(300); cur = side.synchronized(side.size)
        }
        p
      } finally spark.listenerManager.unregister(listener)
    assert(pushed.nonEmpty, "no scan over the BM25 postings index found")
    assert(pushed.forall(s => s.contains("In(term") || s.contains("EqualTo(term")),
      s"an un-term-filtered postings leg joined into the ranked BM25 plan: $pushed")
    assert(side.synchronized(side.exists(_.contains("IsNull(term"))),
      s"the corpus-stats read lost its IsNull pushdown: ${side.synchronized(side.toSeq)}")
  }

  test("text_bm25_pruned: the prune branch fires and EVERY serving read stays term- or IsNull-pruned") {
    // The max-score path's scale contract (r18): pruning saves the
    // common-side statistics aggregation (build-time sidecar) and the
    // corpus-wide score shuffle, but it may NOT buy that with an
    // un-pruned index read anywhere on the SERVING path — the sidecar
    // stats read, the candidate discovery, the candidate tf/scoring
    // legs, the threshold round-trip, and the corpus-stats side
    // aggregates must all scan the index with either the query-term
    // pushdown or the NULL-term (doclen rows) pushdown. The candidate
    // checkpoint means the FINAL plan holds no index scan at all. The
    // index is built FIRST, outside the capture: the build legitimately
    // reads its own just-written postings un-filtered (once, to derive
    // the per-term stats) — the pin is about queries, not builds.
    val docsPath = s"$sf/documents.parquet"
    val idx = java.nio.file.Files.createTempDirectory("pin_bm25_pruned").toString +
      "/postings_bm25_pruned"
    graft.operators.TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
    val side = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = side.synchronized {
        collectAll(qe.executedPlan) {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.contains("postings_bm25_pruned")) =>
            side += f.metadata.getOrElse("PushedFilters", "[]"): Unit
        }: Unit
      }
      override def onFailure(
          funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val finalScans =
      try {
        val served = graft.operators.TextIndex.bm25SearchPruned(
          spark, docsPath, idx, graft.operators.TextIndex.PrunedFixtureQuery, 20,
          commonDfFrac = 0.06)
        val p = collectAll(served.queryExecution.executedPlan) {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.contains("postings_bm25_pruned")) =>
            f.metadata.getOrElse("PushedFilters", "[]")
        }
        assert(served.count() === 20L)
        // drain the async listener bus: wait until the capture is quiet
        var last = -1
        var cur = side.synchronized(side.size)
        val deadline = System.currentTimeMillis() + 15000
        while (cur != last && System.currentTimeMillis() < deadline) {
          last = cur; Thread.sleep(300); cur = side.synchronized(side.size)
        }
        p
      } finally spark.listenerManager.unregister(listener)
    assert(graft.operators.TextIndex.lastPruneFired,
      "the prune branch did not fire on the fixture query — the audited plan is the fallback")
    assert(graft.operators.TextIndex.lastStatsFromSidecar,
      "a fresh r18 build did not serve its statistics from the _termstats sidecar")
    assert(finalScans.isEmpty,
      s"the pruned final plan re-read the postings index past the checkpoint: $finalScans")
    val captured = side.synchronized(side.toSeq)
    assert(captured.nonEmpty, "no postings-index scan captured across the serving side actions")
    assert(captured.forall(s =>
      s.contains("In(term") || s.contains("EqualTo(term") || s.contains("IsNull(term")),
      s"an un-pruned postings read hid inside the pruned serving path: $captured")
  }

  test("sim_ann_ivfpq_idx prunes the code scan to the probed cl= partitions") {
    // the persisted PQ layout's whole point: the candidate stage reads
    // nProbe cluster directories of ~10 B/vec codes, never the corpus —
    // the probed ids must survive as a planning-time partition filter
    val scans = collectAll(executed("sim_ann_ivfpq_idx")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("ivfpq_idx")) => f
    }
    assert(scans.nonEmpty, "no parquet scan over the PQ code index found")
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "the code scan lost its planning-time partition filter — full-layout sweep")
  }

  test("PQ search is UDF-free: candidate scoring runs as the native ADC expression") {
    // r15 verdict low-item 3: the ADC scorer was the one Scala UDF left
    // on a hot path — per-candidate boxing plus a whole-stage codegen
    // break. It is now graft_adc_distance over the broadcast probe
    // frame's table column; a reintroduced UDF fails here.
    val p = executed("sim_ann_ivfpq_idx")
    val txt = collectAll(p) { case x => x }.map(_.verboseString(10)).mkString("\n")
    assert(!txt.contains("ScalaUDF") && !txt.contains("UDF("),
      "a Scala UDF reappeared in the PQ search plan")
    assert(txt.contains("graft_adc_distance"),
      "the native ADC expression is not in the PQ search plan")
  }

  test("star join broadcasts its dimension tables") {
    val bc = collectAll(executed("join_star_broadcast")) { case b: BroadcastExchangeExec => b }
    assert(bc.size >= 2, s"expected >=2 broadcast exchanges, got ${bc.size}")
  }

  test("analytic multi-join queries broadcast their dims and push date filters") {
    // TPC-H Q3/Q5/Q10 shapes: the multi-join ordering surface. Each must
    // (a) broadcast at least its nation/region dims, (b) plan no
    // cartesian (also swept fleet-wide below), and (c) land its date /
    // flag predicates in the parquet scans rather than post-join filters.
    for (q <- Seq("analytics_q3", "analytics_q5", "analytics_q7", "analytics_q8", "analytics_q10")) {
      val plan = executed(q)
      val bc = collectAll(plan) { case b: BroadcastExchangeExec => b }
      assert(bc.nonEmpty, s"$q: no broadcast exchange — dim joins degraded to shuffles")
      val pushed = collectAll(plan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metadata.getOrElse("PushedFilters", "[]")
      }
      assert(pushed.exists(s => s != "[]" && s.nonEmpty), s"$q: no pushed filters in any scan")
    }
  }

  test("column pruning: a two-column projection reads a two-column schema") {
    val plan = executed("dedup_keyed") // projects user_id, event_type, event_id from events
    val schemas = collectAll(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.requiredSchema.fieldNames.toSet
    }
    assert(schemas.nonEmpty && schemas.forall(_.subsetOf(Set("user_id", "event_type", "event_id", "ts"))),
      s"events scan reads more than needed: $schemas")
  }

  test("win_ntile keeps every window off the data path (no global-window funnel)") {
    // Since the round-5 narrow rewrite the LOCAL rank is a mapPartitions
    // counter (no WindowExec, no second full-data exchange); the only
    // windows left in the plan at all are the metadata-scale cumulative
    // offsets over per-partition counts. Pin exactly that.
    val wins = collectAll(executed("win_ntile")) { case w: WindowExec => w }
    val global = wins.filter(_.partitionSpec.isEmpty)
    assert(global.size <= 2, s"unexpected global windows: ${global.size}")
    global.foreach { w =>
      val aggBelow = w.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.groupingExpressions.exists(_.toString.contains("__pid")) => a
      }
      assert(aggBelow.isDefined, "global window not over per-partition counts")
    }
  }

  test("pack_chunks and skew_report keep the global cumsum off the data path") {
    for (q <- Seq("pack_chunks", "skew_report")) {
      val wins = collectAll(executed(q)) { case w: WindowExec => w }
      val global = wins.filter(_.partitionSpec.isEmpty)
      global.foreach { w =>
        val aggBelow = w.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
              if a.groupingExpressions.exists(_.toString.contains("__pid")) => a
        }
        assert(aggBelow.isDefined, s"$q: global window not over per-partition metadata")
      }
    }
  }

  test("no declared query plans a cartesian product (except the intentional cross join)") {
    // A CartesianProduct appearing in any other query means a join
    // condition was lost (or planned as nested-loop-over-everything) —
    // the classic silent 100 TB killer. BroadcastNestedLoopJoin with a
    // broadcast probe side (sim queries) is fine and not matched here.
    val allowed = Set("join_cross")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = executed(name)
      val cart = collectAll(plan) {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      if (cart.nonEmpty && !allowed(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("no declared query plans an unpartitioned data-path window") {
    // Window.orderBy with no partition key funnels the whole table into
    // one task — the round-1 scale-killer, pinned fleet-wide: the only
    // allowed empty-partition windows are DistributedRank's cumulative
    // offsets over per-partition counts (metadata-scale by construction).
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val globals = collectAll(executed(name)) {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      val bad = globals.filterNot { w =>
        w.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
              if a.groupingExpressions.exists(_.toString.contains("__pid")) => a
        }.isDefined
      }
      if (bad.nonEmpty) Some(s"$name(${bad.size})") else None
    }
    assert(offenders.isEmpty, s"unpartitioned data-path windows in: $offenders")
  }

  test("whole-stage codegen spans cover the hot aggregation path") {
    // Under AQE the plan-tree API surfaces the unwrapped stage plans, so
    // audit codegen on a non-adaptive clone of the session (same query,
    // same physical operators, statically collapsed).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SparkEntry.queries("agg_pricing_summary")(s2, sf)
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, "no WholeStageCodegen stage in the pricing-summary plan")
  }
}
