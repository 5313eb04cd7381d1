package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, posexplode}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{CosineSimilarity, SignBandKeys}
import graft.operators.SkewTools

/** SIMILARITY JOIN as an ENGINE FEATURE (SURVEY §4.2's "optional custom
  * SparkStrategy only if we later add a SIMILARITY JOIN logical node"):
  * a first-class logical operator
  *
  *   `SimilarityJoin(left, right, leftKey, leftVec, rightKey, rightVec, t)`
  *
  * that the planner lowers into the banded sign-LSH physical shape —
  * per-side (key, vec) signature generate → hot-bucket cap → equi-join on
  * (band, key) over KEY-ONLY rows → distinct candidate key pairs →
  * vectors fetched back by key → exact cosine ≥ t. The key columns
  * (unique per row, the caller's contract) are what keep the band join
  * narrow: ~24 bytes per exploded row through the shuffle instead of the
  * full row with its 64-double vector — the same candidates-then-fetch
  * shape the function-level operator (`Similarity.embedNearDupLsh`)
  * measures 4× faster than vectors-through-the-join at sf0.1.
  *
  * Planner integration is a LOGICAL lowering rule rather than a custom
  * `SparkPlan`, deliberately: the expansion emits stock Generate / Join /
  * Filter / Aggregate / Project nodes, so the standard strategies,
  * whole-stage codegen, AND AQE (skew-join splitting, runtime broadcast
  * demotion) all still apply to the result. A bespoke physical operator
  * would have to reimplement every one of those. This mirrors how Spark
  * itself lowers high-level operators (e.g. `dropDuplicates` →
  * `Aggregate`) at the logical layer and reserves `SparkStrategy` for
  * shapes stock operators cannot express — which this one can.
  *
  * Semantics: one row per DISTINCT (leftKey, rightKey) pair whose
  * quantized cosine ≥ threshold AND that collides in ≥1 of the `bands`
  * sign-LSH bands whose bucket survives the hot-bucket cap (same
  * zero-false-negative band-parameter contract AND the same quadratic-
  * bucket guard as `Similarity.embedNearDupLsh`, both pinned by
  * SimilarityJoinSpec against the all-pairs reference). Output =
  * left.output ++ right.output :+ cos.
  *
  * `selfJoin = true` records that both children compute the SAME relation
  * (detected by the builder via `sameResult`): the lowering then derives
  * every branch from the left child so the banded-signature subtree is
  * literally shared — the two band-join exchanges canonicalize equal and
  * the planner computes the signature ONCE (ReuseExchange / AQE stage
  * reuse), likewise the two fetch-side exchanges.
  */
case class SimilarityJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftVec: Attribute,
    rightKey: Attribute,
    rightVec: Attribute,
    threshold: Double,
    bitsPerBand: Int,
    bands: Int,
    cap: Int = 1000,
    selfJoin: Boolean = false,
    cosAttr: AttributeReference = AttributeReference("cos", DoubleType)()
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output :+ cosAttr
  // cos is synthesized by this operator, not drawn from a child —
  // declare it so CheckAnalysis's missing-input audit passes
  override def producedAttributes: AttributeSet = AttributeSet(cosAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): LogicalPlan = copy(left = newLeft, right = newRight)
}

/** Lowers [[SimilarityJoin]] into the banded candidates-then-fetch plan.
  * Runs in the optimizer (injected by GraftExtensions, or late via
  * `spark.experimental.extraOptimizations` from
  * `GraftExtensions.register`). The node arrives resolved — the API
  * builds it from analyzed children — and the expansion emits only
  * resolved nodes, so the rule is placement-independent.
  *
  * The banded candidate subtree is built with the SAME DataFrame-level
  * pieces the function-level operator uses (SignBandKeys explode +
  * `SkewTools.dropHotKeys`), analyzed standalone, and embedded — one
  * hot-bucket-guard implementation for both spellings, and the emitted
  * nodes are stock operators so outer-plan optimization and AQE still
  * apply. Every branch is wrapped in a fresh-alias Project so references
  * never collide; a final Project restores the node's declared exprIds.
  */
object ExpandSimilarityJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // Key-pair predicate pushdown THROUGH the node: `WHERE v1 < v2` (the
    // canonical unordered-pairs filter on a self-join) applied above the
    // node would otherwise run after the band join, the candidate
    // distinct, both fetch joins, and the cosine — on BOTH orderings of
    // every pair. Keys pass through the banded plan unchanged, so a
    // comparison of the two key columns commutes with all of it: inject
    // it into the band join's condition and the whole pipeline processes
    // half the candidates (measured ~1.7× on sim_join_node at sf0.1).
    // The Filter is consumed — candidates restricted imply outputs
    // restricted. Matches directly above the node and through the
    // rename-Project the SQL table function wraps around it.
    case Filter(cond, sj: SimilarityJoin) if keyPairPred(cond, sj).isDefined =>
      expand(sj, keyPairPred(cond, sj))
    case Filter(cond, Project(projList, sj: SimilarityJoin))
        if keyPairPred(unalias(cond, projList), sj).isDefined =>
      Project(projList, expand(sj, keyPairPred(unalias(cond, projList), sj)))
    case sj: SimilarityJoin => expand(sj, None)
  }

  /** Rewrite `cond`'s references through a projection's simple aliases
    * (Alias(attr, name) / pass-through attrs) so a filter written against
    * renamed output columns can be tested against the node's own keys. */
  private def unalias(cond: Expression, projList: Seq[NamedExpression]): Expression = {
    val m: Map[ExprId, Attribute] = projList.collect {
      case a @ Alias(child: Attribute, _) => a.exprId -> child
      case a: Attribute                   => a.exprId -> a
    }.toMap
    cond.transform { case a: Attribute if m.contains(a.exprId) => m(a.exprId) }
  }

  /** `cond` as a pushable key-pair predicate: a binary comparison whose
    * two sides are exactly the node's left and right key attributes (in
    * either order). Returns it normalized to reference those keys. */
  private def keyPairPred(cond: Expression, sj: SimilarityJoin): Option[Expression] =
    cond match {
      case c: BinaryComparison =>
        val ok = Seq(c.left, c.right).forall {
          case a: Attribute =>
            a.exprId == sj.leftKey.exprId || a.exprId == sj.rightKey.exprId
          case _ => false
        }
        val both = c.left != c.right &&
          Seq(c.left, c.right).collect { case a: Attribute => a.exprId }.toSet ==
            Set(sj.leftKey.exprId, sj.rightKey.exprId)
        if (ok && both) Some(c) else None
      case _ => None
    }

  /** Capped banded rows for one (key, vec) side: (key, __band_idx,
    * __band_key) with buckets hotter than `max(cap, 8× mean)` dropped —
    * the quadratic-bucket guard. On a boilerplate-heavy corpus one
    * mega-bucket would make the band join quadratic; the anomalous-bucket
    * anti-join bounds it, and true near-dup pairs keep surfacing through
    * their other, colder bands (the documented LSH trade, DedupSkewSpec).
    */
  private def cappedBanded(
      spark: SparkSession,
      child: LogicalPlan,
      key: Attribute,
      vec: Attribute,
      sj: SimilarityJoin
  ): LogicalPlan = {
    val side = PlanBridge.ofRows(spark, Project(Seq(key, vec), child))
    // Repartition by key before the ×bands explode — same single-row-
    // group parallelism-collapse guard as Similarity.lshKeyed: without
    // it the signature and the band-join map side run at input-split
    // parallelism (one task for a sub-row-group-sized table). Explicit
    // count so AQE cannot coalesce it back to one task.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = side.repartition(parts, col(key.name)).select(
      col(key.name),
      posexplode(
        SignBandKeys.keysColumn(col(vec.name), sj.bitsPerBand, sj.bands, SignBandKeys.DefaultSeed))
        .as(Seq("__band_idx", "__band_key"))
    )
    SkewTools
      .dropHotKeys(keyed, Seq("__band_idx", "__band_key"), sj.cap)
      .queryExecution
      .optimizedPlan
  }

  /** Fresh-alias copy of a plan: every branch of the expansion references
    * its inputs through one of these, so attribute bindings stay
    * unambiguous even when branches share the same underlying subtree. */
  private def aliasedCopy(p: LogicalPlan): (LogicalPlan, Map[ExprId, Attribute]) = {
    val aliases = p.output.map(a => Alias(a, a.name)())
    val byId = p.output.zip(aliases).map { case (o, al) => o.exprId -> al.toAttribute }.toMap
    (Project(aliases, p), byId)
  }

  private def expand(sj: SimilarityJoin, pushedPairPred: Option[Expression] = None): LogicalPlan = {
    val spark = SparkSession.active

    // Self-join: derive the right side from the LEFT child, mapping the
    // declared right attributes positionally (sameResult guarantees the
    // outputs correspond column-for-column).
    val rightPos: Map[ExprId, Attribute] =
      if (sj.selfJoin) sj.right.output.zip(sj.left.output).map { case (r, l) => r.exprId -> l }.toMap
      else sj.right.output.map(a => a.exprId -> a).toMap
    val rightBase: LogicalPlan = if (sj.selfJoin) sj.left else sj.right
    val rKeyBase = rightPos(sj.rightKey.exprId)
    val rVecBase = rightPos(sj.rightVec.exprId)

    // 1. candidate key pairs from the narrow, capped band join. On a
    // self-join the SAME capped subtree instance backs both sides: the
    // two band exchanges canonicalize equal → signature computed once.
    val lCapped = cappedBanded(spark, sj.left, sj.leftKey, sj.leftVec, sj)
    val rCapped = if (sj.selfJoin) lCapped else cappedBanded(spark, rightBase, rKeyBase, rVecBase, sj)
    def bandAttr(p: LogicalPlan, m: Map[ExprId, Attribute], n: String): Attribute =
      m(p.output.find(_.name == n).get.exprId)
    val (lB, lbId) = aliasedCopy(lCapped)
    val (rB, rbId) = aliasedCopy(rCapped)
    // NO strategy hint (r18) — the lowered node must land the SAME plan
    // as the hand-built lshCandidates path, which leaves the band join
    // unhinted: with AQE (the session posture) the runtime sizes decide
    // — a fixture-scale banded side broadcasts (measured: the forced
    // SHUFFLE_HASH of the r17 lowering kept the band join shuffled, and
    // the distinct's pair exchange then carried 57 MB of pre-distinct
    // candidates that the broadcast plan never exchanges — 2.0 s vs
    // 1.5 s walls vs the DataFrame twin), while an exploded-corpus-sized
    // side exceeds the adaptive broadcast threshold and stays a shuffle
    // join. If a deployment runs AQE-OFF, though, the static planner's
    // post-aggregate underestimate could broadcast an exploded-corpus-
    // sized band side (the r17-documented driver-OOM hazard), so the
    // unhinted plan is GATED on adaptive execution (r19, ADVICE):
    // AQE-off sessions keep the scale-safe forced SHUFFLE_HASH; AQE
    // sessions get the measured-faster unhinted plan, same as the
    // hand-built twin under the shipped session.
    val bandHint =
      if (spark.conf.get("spark.sql.adaptive.enabled", "true").toBoolean) JoinHint.NONE
      else JoinHint(
        Some(HintInfo(strategy = Some(SHUFFLE_HASH))),
        Some(HintInfo(strategy = Some(SHUFFLE_HASH))))
    val lCk = lbId(sj.leftKey.exprId)
    val rCk = rbId(rKeyBase.exprId)
    // A pushed key-pair predicate joins the band condition, rewritten to
    // the band-side key attributes (right side through the positional
    // self-join mapping): the join emits only qualifying pairs, so every
    // downstream stage (distinct, fetches, cosine) sees the halved set.
    val bandCond0 = And(
      EqualTo(bandAttr(lCapped, lbId, "__band_idx"), bandAttr(rCapped, rbId, "__band_idx")),
      EqualTo(bandAttr(lCapped, lbId, "__band_key"), bandAttr(rCapped, rbId, "__band_key")))
    val bandCond = pushedPairPred match {
      case Some(p) =>
        val mapped = p.transform {
          case a: Attribute if a.exprId == sj.leftKey.exprId  => lCk
          case a: Attribute if a.exprId == sj.rightKey.exprId => rCk
        }
        And(bandCond0, mapped)
      case None => bandCond0
    }
    val bandJoin = Join(lB, rB, Inner, Some(bandCond), bandHint)
    val candKeys: Seq[NamedExpression] = Seq(lCk, rCk)
    val cands = Aggregate(candKeys, candKeys, Project(candKeys, bandJoin))

    // 2. fetch full rows back by key. Self-join: both fetch branches wrap
    // the same left subtree → their exchanges canonicalize equal → the
    // fetch-side scan/shuffle is computed once too.
    val (fetchL, flId) = aliasedCopy(sj.left)
    val (fetchR, frId) = aliasedCopy(rightBase)
    val withLeft =
      Join(cands, fetchL, Inner, Some(EqualTo(lCk, flId(sj.leftKey.exprId))), JoinHint.NONE)
    val withRight =
      Join(withLeft, fetchR, Inner, Some(EqualTo(rCk, frId(rKeyBase.exprId))), JoinHint.NONE)

    // 3. score, restore the declared output exprIds, apply the threshold
    val cosAlias = Alias(
      CosineSimilarity(flId(sj.leftVec.exprId), frId(rVecBase.exprId)),
      sj.cosAttr.name
    )(exprId = sj.cosAttr.exprId)
    val restored: Seq[NamedExpression] =
      sj.left.output.map(o => Alias(flId(o.exprId), o.name)(exprId = o.exprId)) ++
        sj.right.output.map(o =>
          Alias(frId(rightPos(o.exprId).exprId), o.name)(exprId = o.exprId)) :+
        cosAlias
    Filter(
      GreaterThanOrEqual(sj.cosAttr, Literal(sj.threshold, DoubleType)),
      Project(restored, withRight)
    )
  }
}

/** Column-free builder API for the [[SimilarityJoin]] node. */
object SimilarityJoinOps {

  private def attr(p: LogicalPlan, name: String): Attribute =
    p.output.find(_.name == name).getOrElse {
      throw new IllegalArgumentException(
        s"similarityJoin: no column '$name' in ${p.output.map(_.name).mkString(", ")}")
    }
  private def vecAttr(p: LogicalPlan, name: String): Attribute = attr(p, name) match {
    case a if a.dataType == ArrayType(DoubleType, true) ||
        a.dataType == ArrayType(DoubleType, false) => a
    case a =>
      throw new IllegalArgumentException(
        s"similarityJoin: column '$name' must be array<double>, got ${a.dataType.simpleString}")
  }

  /** Build the node from two ANALYZED child plans. Shared-lineage right
    * sides are re-aliased (the analyzer's DeduplicateRelations does this
    * for stock joins; custom nodes provide their own); `sameResult`
    * children set the selfJoin flag so the lowering shares one banded
    * subtree across both sides (exchange reuse — computed once). */
  private[graft] def buildNode(
      lp: LogicalPlan,
      rp0: LogicalPlan,
      leftKey: String,
      leftVec: String,
      rightKey: String,
      rightVec: String,
      threshold: Double,
      bitsPerBand: Int,
      bands: Int,
      cap: Int
  ): SimilarityJoin = {
    val shared = lp.outputSet.intersect(rp0.outputSet).nonEmpty
    val self = lp.sameResult(rp0)
    val rp =
      if (shared) Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
      else rp0
    SimilarityJoin(
      lp, rp,
      attr(lp, leftKey), vecAttr(lp, leftVec),
      attr(rp, rightKey), vecAttr(rp, rightVec),
      threshold, bitsPerBand, bands, cap, self)
  }

  /** similarity_join(left, right): DISTINCT key pairs with
    * cos(leftVec, rightVec) ≥ threshold, via the banded LSH
    * candidates-then-fetch plan. `leftKey`/`rightKey` name UNIQUE id
    * columns (the caller's contract — duplicates would fan out the fetch
    * join); `leftVec`/`rightVec` name ARRAY<DOUBLE> columns. On a
    * self-join (shared lineage) the right side is re-aliased first so
    * attribute resolution stays unambiguous.
    *
    * Band parameters left at their `0` sentinel are derived from the
    * threshold via [[graft.operators.Similarity.lshAutoParams]] (S-curve
    * sizing for 99.9% capture at the threshold) — pass both explicitly
    * to pin a regime instead (e.g. the empirically zero-FN (4, 64) the
    * fixture queries use at the 0.4 continuum threshold).
    */
  def similarityJoin(
      left: DataFrame,
      leftKey: String,
      leftVec: String,
      right: DataFrame,
      rightKey: String,
      rightVec: String,
      threshold: Double,
      bitsPerBand: Int = 0,
      bands: Int = 0,
      cap: Int = 1000
  ): DataFrame = {
    val spark = left.sparkSession
    graft.functions.GraftExtensions.register(spark)
    val (r, b) = resolveBands(threshold, bitsPerBand, bands)
    val node = buildNode(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKey, leftVec, rightKey, rightVec, threshold, r, b, cap)
    PlanBridge.ofRows(spark, node)
  }

  /** `(bitsPerBand, bands)` with `0` sentinels resolved: auto-derived
    * from the S-curve when the threshold is in the derivable open (0,1)
    * range, else the legacy (10, 25) default. Explicit non-zero values
    * pass through untouched (both must be given together). */
  private[graft] def resolveBands(threshold: Double, bitsPerBand: Int, bands: Int): (Int, Int) = {
    require(
      (bitsPerBand == 0) == (bands == 0),
      s"pass bitsPerBand and bands together or neither, got ($bitsPerBand, $bands)")
    if (bitsPerBand != 0) (bitsPerBand, bands)
    else if (threshold > 0 && threshold < 1) graft.operators.Similarity.lshAutoParams(threshold)
    else (10, 25)
  }

  /** SQL table-function builder (`graft_similarity_join`), registered by
    * GraftExtensions: takes TABLE NAMES (any relation `spark.table` can
    * resolve — temp views included) plus column names and parameters, and
    * returns the [[SimilarityJoin]] node wrapped in a rename that
    * suffixes right-side columns colliding with left-side names with
    * `_r`, so `SELECT` can address both sides of a self-join:
    *
    * {{{
    * SELECT vec_id AS v1, vec_id_r AS v2, cos
    * FROM graft_similarity_join('emb', 'vec_id', 'v', 'emb', 'vec_id', 'v', 0.9, 10, 25)
    * }}}
    *
    * Arguments: (leftTable, leftKey, leftVec, rightTable, rightKey,
    * rightVec, threshold [, bitsPerBand, bands [, cap]]) — all literals.
    * Omitted band parameters are S-curve-derived from the threshold
    * (see [[resolveBands]]).
    */
  private[graft] def sqlTableFunction(args: Seq[Expression]): LogicalPlan = {
    require(
      args.length == 7 || args.length == 9 || args.length == 10,
      "graft_similarity_join expects (leftTable, leftKey, leftVec, rightTable, rightKey, " +
        s"rightVec, threshold[, bitsPerBand, bands[, cap]]), got ${args.length} arguments")
    def lit(e: Expression, what: String): Any = e match {
      case f if f.foldable => f.eval()
      case other =>
        throw new IllegalArgumentException(
          s"graft_similarity_join: $what must be a literal, got $other")
    }
    def str(i: Int, what: String): String = lit(args(i), what) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other =>
        throw new IllegalArgumentException(
          s"graft_similarity_join: $what must be a string literal, got $other")
    }
    def dbl(i: Int, what: String): Double = lit(args(i), what) match {
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other =>
        throw new IllegalArgumentException(
          s"graft_similarity_join: $what must be numeric, got $other")
    }
    def int(i: Int, what: String): Int = lit(args(i), what) match {
      case n: java.lang.Number => n.intValue()
      case other =>
        throw new IllegalArgumentException(
          s"graft_similarity_join: $what must be an int literal, got $other")
    }
    val spark = SparkSession.active
    val lp = spark.table(str(0, "leftTable")).queryExecution.analyzed
    val rp0 = spark.table(str(3, "rightTable")).queryExecution.analyzed
    val threshold = dbl(6, "threshold")
    val (bpb, nb) = resolveBands(
      threshold,
      if (args.length >= 9) int(7, "bitsPerBand") else 0,
      if (args.length >= 9) int(8, "bands") else 0)
    val node = buildNode(
      lp, rp0,
      str(1, "leftKey"), str(2, "leftVec"), str(4, "rightKey"), str(5, "rightVec"),
      threshold, bpb, nb,
      if (args.length == 10) int(9, "cap") else 1000)
    // SQL-addressable output: right-side names colliding with any name
    // already emitted get `_r` suffixes, repeated until unique — a single
    // pass would still collide when the left side itself has an `x_r`
    // column, or when a data column is named `cos` (the score's name,
    // which is reserved first below for the same reason).
    val taken = scala.collection.mutable.Set(node.cosAttr.name)
    def unique(n: String): String = {
      var out = n
      while (!taken.add(out)) out += "_r"
      out
    }
    val renamed = node.left.output.map(a => Alias(a, unique(a.name))()) ++
      node.right.output.map(a => Alias(a, unique(a.name))()) :+
      Alias(node.cosAttr, node.cosAttr.name)()
    Project(renamed, node)
  }
}
