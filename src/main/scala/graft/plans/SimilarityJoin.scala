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
  *   `SimilarityJoin(left, right, leftVec, rightVec, threshold)`
  *
  * that the planner lowers into the banded sign-LSH physical shape —
  * signature generate → equi-join on (band, key) → exact cosine verify →
  * distinct — instead of the user hand-writing that idiom per query.
  *
  * Planner integration is a LOGICAL lowering rule rather than a custom
  * `SparkPlan`, deliberately: the expansion emits stock Generate / Join /
  * Filter / Aggregate nodes, so the standard strategies, whole-stage
  * codegen, AND AQE (skew-join splitting, runtime broadcast demotion)
  * all still apply to the result. A bespoke physical operator would have
  * to reimplement every one of those. This mirrors how Spark itself
  * lowers high-level operators (e.g. `dropDuplicates` → `Aggregate`) at
  * the logical layer and reserves `SparkStrategy` for shapes stock
  * operators cannot express — which this one can.
  *
  * Semantics: one row per DISTINCT (left row, right row) pair whose
  * quantized cosine ≥ threshold AND that collides in ≥1 of the `bands`
  * sign-LSH bands (same zero-false-negative band-parameter contract as
  * `Similarity.embedNearDupLsh`, pinned by SimilarityJoinSpec against the
  * all-pairs reference). Output = left.output ++ right.output :+ cos.
  */
case class SimilarityJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftVec: Expression,
    rightVec: Expression,
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

/** Lowers [[SimilarityJoin]] into the banded plan. Runs in the optimizer
  * (injected by GraftExtensions, or late via
  * `spark.experimental.extraOptimizations` from
  * `GraftExtensions.register`). The node arrives resolved — the API
  * builds it from analyzed children — and the expansion emits only
  * resolved nodes, so the rule is placement-independent.
  */
object ExpandSimilarityJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case sj: SimilarityJoin => expand(sj)
  }

  private def banded(
      child: LogicalPlan,
      vec: Expression,
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
      child = child
    )
    (gen, bandIdx, bandKey)
  }

  private def expand(sj: SimilarityJoin): LogicalPlan = {
    val (lGen, lIdx, lKey) = banded(sj.left, sj.leftVec, sj.bitsPerBand, sj.bands)
    val (rGen, rIdx, rKey) = banded(sj.right, sj.rightVec, sj.bitsPerBand, sj.bands)
    val joined = Join(
      lGen,
      rGen,
      Inner,
      Some(And(EqualTo(lIdx, rIdx), EqualTo(lKey, rKey))),
      JoinHint.NONE
    )
    val pairCols: Seq[Attribute] = sj.left.output ++ sj.right.output
    val cosAlias = Alias(
      CosineSimilarity(sj.leftVec, sj.rightVec),
      sj.cosAttr.name
    )(exprId = sj.cosAttr.exprId)
    val scored = Project(pairCols :+ cosAlias, joined)
    val thresholded =
      Filter(GreaterThanOrEqual(sj.cosAttr, Literal(sj.threshold, DoubleType)), scored)
    // Distinct over (pair, cos): a pair colliding in k bands appears k
    // times after the join; cos is a pure function of the pair, so
    // grouping by it too is free and keeps the plan a plain hash agg.
    val outs: Seq[NamedExpression] = pairCols :+ sj.cosAttr
    Aggregate(outs, outs, thresholded)
  }
}

/** Column-free builder API for the [[SimilarityJoin]] node. */
object SimilarityJoinOps {

  /** similarity_join(left, right): DISTINCT pairs with
    * cos(leftVec, rightVec) ≥ threshold, via the banded LSH plan.
    * `leftVec` / `rightVec` name ARRAY<DOUBLE> columns. On a self-join
    * (shared lineage) the right side is re-aliased first so attribute
    * resolution stays unambiguous.
    */
  def similarityJoin(
      left: DataFrame,
      leftVec: String,
      right: DataFrame,
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

    def vecAttr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse {
        throw new IllegalArgumentException(
          s"similarityJoin: no column '$name' in ${p.output.map(_.name).mkString(", ")}")
      } match {
        case a if a.dataType == ArrayType(DoubleType, true) ||
            a.dataType == ArrayType(DoubleType, false) => a
        case a =>
          throw new IllegalArgumentException(
            s"similarityJoin: column '$name' must be array<double>, got ${a.dataType.simpleString}")
      }

    val node = SimilarityJoin(
      lp, rp, vecAttr(lp, leftVec), vecAttr(rp, rightVec), threshold, bitsPerBand, bands)
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
  }
}
