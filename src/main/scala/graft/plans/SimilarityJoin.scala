package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}
import graft.functions.{CosineSimilarity, SignBandKeys}

/** SIMILARITY JOIN as an ENGINE FEATURE (SURVEY §4.2's "optional custom
  * SparkStrategy only if we later add a SIMILARITY JOIN logical node"):
  * a first-class logical operator
  *
  *   `SimilarityJoin(left, right, leftKey, leftVec, rightKey, rightVec, t)`
  *
  * that the planner lowers into the banded sign-LSH physical shape —
  * per-side (key, vec) signature generate → equi-join on (band, key) over
  * KEY-ONLY rows → distinct candidate key pairs → vectors fetched back by
  * key → exact cosine ≥ t. The key columns (unique per row, the caller's
  * contract) are what keep the band join narrow: ~24 bytes per exploded
  * row through the shuffle instead of the full row with its 64-double
  * vector — the same candidates-then-fetch shape the function-level
  * operator (`Similarity.embedNearDupLsh`) measures 4× faster than
  * vectors-through-the-join at sf0.1.
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
  * sign-LSH bands (same zero-false-negative band-parameter contract as
  * `Similarity.embedNearDupLsh`, pinned by SimilarityJoinSpec against the
  * all-pairs reference). Output = left.output ++ right.output :+ cos.
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
  * Each child subtree is referenced twice (band branch + fetch branch);
  * the fetch branch re-aliases every output attribute with fresh exprIds
  * so references stay unambiguous, and a final Project restores the
  * node's declared output exprIds. Re-computing the child twice is the
  * same trade the function-level operator makes (scans are cheap; wide
  * rows through the band shuffle are not).
  */
object ExpandSimilarityJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case sj: SimilarityJoin => expand(sj)
  }

  /** Key-only banded rows: Project(key, vec) → Generate(band keys) →
    * Project(key, band_idx, band_key). */
  private def banded(
      child: LogicalPlan,
      key: Attribute,
      vec: Attribute,
      bitsPerBand: Int,
      bands: Int
  ): (LogicalPlan, Attribute, Attribute) = {
    val bandIdx = AttributeReference("__band_idx", IntegerType, nullable = false)()
    val bandKey = AttributeReference("__band_key", LongType, nullable = false)()
    val gen = Generate(
      PosExplode(SignBandKeys(vec, bitsPerBand, bands, SignBandKeys.DefaultSeed)),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(bandIdx, bandKey),
      child = Project(Seq(key, vec), child)
    )
    (Project(Seq(key, bandIdx, bandKey), gen), bandIdx, bandKey)
  }

  private def expand(sj: SimilarityJoin): LogicalPlan = {
    // 1. candidate key pairs from the narrow band join
    val (lBands, lIdx, lKey) = banded(sj.left, sj.leftKey, sj.leftVec, sj.bitsPerBand, sj.bands)
    val (rBands, rIdx, rKey) = banded(sj.right, sj.rightKey, sj.rightVec, sj.bitsPerBand, sj.bands)
    val bandJoin = Join(
      lBands,
      rBands,
      Inner,
      Some(And(EqualTo(lIdx, rIdx), EqualTo(lKey, rKey))),
      JoinHint.NONE
    )
    val candKeys: Seq[NamedExpression] = Seq(sj.leftKey, sj.rightKey)
    val cands = Aggregate(candKeys, candKeys, Project(candKeys, bandJoin))

    // 2. fetch full rows back by key — fresh exprIds per fetch branch so
    // references never collide with the band branch
    def fetch(child: LogicalPlan): (LogicalPlan, Map[ExprId, Attribute]) = {
      val aliases = child.output.map(a => Alias(a, a.name)())
      val mapping = child.output.zip(aliases).map { case (o, al) => o.exprId -> al.toAttribute }.toMap
      (Project(aliases, child), mapping)
    }
    val (fetchL, lMap) = fetch(sj.left)
    val (fetchR, rMap) = fetch(sj.right)
    val withLeft = Join(
      cands, fetchL, Inner, Some(EqualTo(sj.leftKey, lMap(sj.leftKey.exprId))), JoinHint.NONE)
    val withRight = Join(
      withLeft, fetchR, Inner, Some(EqualTo(sj.rightKey, rMap(sj.rightKey.exprId))), JoinHint.NONE)

    // 3. score, restore the declared output exprIds, apply the threshold
    val cosAlias = Alias(
      CosineSimilarity(lMap(sj.leftVec.exprId), rMap(sj.rightVec.exprId)),
      sj.cosAttr.name
    )(exprId = sj.cosAttr.exprId)
    val restored: Seq[NamedExpression] =
      sj.left.output.map(o => Alias(lMap(o.exprId), o.name)(exprId = o.exprId)) ++
        sj.right.output.map(o => Alias(rMap(o.exprId), o.name)(exprId = o.exprId)) :+
        cosAlias
    Filter(
      GreaterThanOrEqual(sj.cosAttr, Literal(sj.threshold, DoubleType)),
      Project(restored, withRight)
    )
  }
}

/** Column-free builder API for the [[SimilarityJoin]] node. */
object SimilarityJoinOps {

  /** similarity_join(left, right): DISTINCT key pairs with
    * cos(leftVec, rightVec) ≥ threshold, via the banded LSH
    * candidates-then-fetch plan. `leftKey`/`rightKey` name UNIQUE id
    * columns (the caller's contract — duplicates would fan out the fetch
    * join); `leftVec`/`rightVec` name ARRAY<DOUBLE> columns. On a
    * self-join (shared lineage) the right side is re-aliased first so
    * attribute resolution stays unambiguous.
    */
  def similarityJoin(
      left: DataFrame,
      leftKey: String,
      leftVec: String,
      right: DataFrame,
      rightKey: String,
      rightVec: String,
      threshold: Double,
      bitsPerBand: Int = 10,
      bands: Int = 25
  ): DataFrame = {
    val spark = left.sparkSession
    graft.functions.GraftExtensions.register(spark)
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // Self-join lineage: mint fresh exprIds for the right side's visible
    // attributes so vec/condition references bind unambiguously (the
    // analyzer's DeduplicateRelations does this for stock joins; custom
    // nodes provide their own).
    val rp =
      if (lp.outputSet.intersect(rp0.outputSet).nonEmpty)
        Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
      else rp0

    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse {
        throw new IllegalArgumentException(
          s"similarityJoin: no column '$name' in ${p.output.map(_.name).mkString(", ")}")
      }
    def vecAttr(p: LogicalPlan, name: String): Attribute = attr(p, name) match {
      case a if a.dataType == ArrayType(DoubleType, true) ||
          a.dataType == ArrayType(DoubleType, false) => a
      case a =>
        throw new IllegalArgumentException(
          s"similarityJoin: column '$name' must be array<double>, got ${a.dataType.simpleString}")
    }

    val node = SimilarityJoin(
      lp, rp,
      attr(lp, leftKey), vecAttr(lp, leftVec),
      attr(rp, rightKey), vecAttr(rp, rightVec),
      threshold, bitsPerBand, bands)
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
  }
}
