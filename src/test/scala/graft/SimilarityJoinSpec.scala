package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.SimilarityJoinOps

/** The SIMILARITY JOIN engine feature: the SimilarityJoin logical node
  * must lower to the banded LSH plan (hash/sort-merge equi-join on band
  * keys — never a nested-loop cross product on the data path), carry the
  * same hot-bucket guard as the function-level operator, reuse one banded
  * subtree per self-join, and return exactly the all-pairs reference
  * result at band parameters with zero false negatives for the data's
  * similarity structure.
  */
class SimilarityJoinSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def corpus = Tables
    .embeddings(spark, sf)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  private def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] =
    graft.tools.PlanProbe.collectAll(p)(pf)

  /** A BroadcastNestedLoopJoin is tolerable ONLY when its BROADCAST side
    * IS a global (one-row) aggregate — the hot-bucket guard's
    * mean-bucket-size broadcast — after unwrapping stage/exchange/codegen
    * wrappers. Requiring the agg on the build side itself (not merely
    * somewhere in a subtree) keeps the guard strict: a data-path BNL
    * whose lineage happens to CONTAIN the one-row agg still fails. */
  private def isOneRowAggBnl(
      b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec): Boolean = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val side = b.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
      case _                                                 => b.right
    }
    def oneRowAgg(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => oneRowAgg(a.executedPlan)
      case q: QueryStageExec        => oneRowAgg(q.plan)
      // a reused exchange is a leaf pointer; its origin exchange is
      // audited wherever it appears in full
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => true
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        a.groupingExpressions.isEmpty
      case u: org.apache.spark.sql.execution.UnaryExecNode => oneRowAgg(u.child)
      case _                                               => false
    }
    oneRowAgg(side)
  }

  test("self similarity join ≡ exact all-pairs at threshold 0.4 (fixture zero-FN params)") {
    graft.functions.GraftExtensions.register(spark)
    val l = corpus.select(col("vec_id").as("lid"), col("v").as("lv"))
    val r = corpus.select(col("vec_id").as("rid"), col("v").as("rv"))
    val sj = SimilarityJoinOps
      .similarityJoin(l, "lid", "lv", r, "rid", "rv", threshold = 0.4, bitsPerBand = 4, bands = 64)
      .filter(col("lid") < col("rid"))
      .select(col("lid"), col("rid"))
    val got = sj.collect().map(x => (x.getLong(0), x.getLong(1))).toSet

    val e = corpus
    val expected = e
      .as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("lid"),
        col("b.vec_id").as("rid"),
        graft.functions.CosineSimilarity.column(col("a.v"), col("b.v")).as("cos")
      )
      .filter(col("cos") >= 0.4)
      .select("lid", "rid")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    assert(got === expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.nonEmpty)
  }

  test("the lowered plan is a banded equi-join: no data-path nested-loop or cartesian") {
    val l = corpus.select(col("vec_id").as("lid"), col("v").as("lv"))
    val r = corpus.select(col("vec_id").as("rid"), col("v").as("rv"))
    val df = SimilarityJoinOps.similarityJoin(l, "lid", "lv", r, "rid", "rv", threshold = 0.9)
    val plan = df.queryExecution.executedPlan
    val cartesians = collectAll(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(cartesians.isEmpty, s"similarity join planned a cartesian product: $cartesians")
    val badBnl = collectAll(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec if !isOneRowAggBnl(b) => b
    }
    assert(badBnl.isEmpty, s"similarity join nested-loops over data: $badBnl")
    val generators = collectAll(plan) { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(generators.size >= 2, s"expected band-signature generators, got ${generators.size}")
    val hashJoins = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if !j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] => j
    }
    assert(hashJoins.nonEmpty, "no equi-join found in the lowered plan")
  }

  test("key-pair filter pushes into the band join (halved candidate pipeline)") {
    import org.apache.spark.sql.catalyst.expressions.LessThan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join => LJoin}
    val l = corpus.select(col("vec_id").as("lid"), col("v").as("lv"))
    val r = corpus.select(col("vec_id").as("rid"), col("v").as("rv"))
    val df = SimilarityJoinOps
      .similarityJoin(l, "lid", "lv", r, "rid", "rv", threshold = 0.4, bitsPerBand = 4, bands = 64)
      .filter(col("lid") < col("rid"))
    val opt = df.queryExecution.optimizedPlan
    // The band join (band_idx/band_key equality) must carry the key
    // comparison as a third conjunct...
    val pushed = opt.collect {
      case j: LJoin if j.condition.exists { c =>
        val s = c.sql
        s.contains("__band_key") && c.exists(_.isInstanceOf[LessThan])
      } => j
    }
    assert(pushed.nonEmpty, "pair predicate not pushed into the band join")
    // ...and no residual key-pair Filter may remain above the expansion.
    val residual = opt.collect {
      case f: LFilter if f.condition.exists(_.isInstanceOf[LessThan]) &&
        !f.condition.sql.contains("__band") => f
    }
    assert(residual.isEmpty, s"residual key-pair filter: ${residual.map(_.condition.sql)}")
    // Semantics unchanged vs filtering AFTER the node (no pushdown path).
    val unpushed = SimilarityJoinOps
      .similarityJoin(l, "lid", "lv", r, "rid", "rv", threshold = 0.4, bitsPerBand = 4, bands = 64)
      .filter(col("lid") <= col("rid") - 1) // not a bare comparison → stays above
      .select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = df.select(col("lid"), col("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === unpushed, "pushdown changed the result set")
  }

  test("self-join shares one banded subtree: exchange reuse in the physical plan") {
    // sameResult children → the lowering derives both sides from the left
    // child; with AQE off the static ReuseExchange rule must then dedup
    // the band-side (and fetch-side) exchanges — the signature is
    // computed ONCE, not once per side.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    graft.functions.GraftExtensions.register(s2)
    val e = Tables
      .embeddings(s2, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val l = e.select(col("vec_id").as("lid"), col("v").as("lv"))
    val r = e.select(col("vec_id").as("rid"), col("v").as("rv"))
    val df = SimilarityJoinOps
      .similarityJoin(l, "lid", "lv", r, "rid", "rv", threshold = 0.4, bitsPerBand = 4, bands = 64)
    val reused = df.queryExecution.executedPlan.collect {
      case rx: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => rx
    }
    assert(reused.nonEmpty, "self-join lowering did not reuse the banded subtree's exchange")
    // and the shared-subtree plan still returns the right answer
    assert(df.filter(col("lid") < col("rid")).count() ===
      Similarity_allPairsCount(e, 0.4))
  }

  private def Similarity_allPairsCount(e: org.apache.spark.sql.DataFrame, t: Double): Long =
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.CosineSimilarity.column(col("a.v"), col("b.v")) >= t)
      .count()

  test("hot-bucket guard caps a cloned-vector mega-bucket in the node lowering") {
    // 500 identical clones collide in EVERY band (the boilerplate
    // mega-bucket); 100 distinct gaussian vectors are honest background.
    // Uncapped, the clone block alone is 500·499/2 = 124 750 verified
    // pairs; with the cap the anomalous buckets are dropped before the
    // band join and the join stays linear — the same trade
    // DedupSkewSpec pins for the function-level operator.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val clone = Seq.fill(64)(rnd.nextGaussian())
    val e = ((0 until 500).map(i => (i.toLong, clone)) ++
      (500 until 600).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian())))).toDF("vec_id", "v")
    val l = e.select(col("vec_id").as("lid"), col("v").as("lv"))
    val r = e.select(col("vec_id").as("rid"), col("v").as("rv"))
    def pairs(cap: Int): Long = SimilarityJoinOps
      .similarityJoin(l, "lid", "lv", r, "rid", "rv",
        threshold = 0.9, bitsPerBand = 10, bands = 25, cap = cap)
      .filter(col("lid") < col("rid"))
      .count()
    assert(pairs(cap = 1 << 30) === 124750L, "uncapped node must verify the full clone block")
    val capped = pairs(cap = 100)
    assert(capped < 1000L, s"capped node lowering still produced $capped pairs from the mega-bucket")
  }

  test("SQL table function graft_similarity_join reaches the banded node plan") {
    graft.functions.GraftExtensions.register(spark)
    corpus.createOrReplaceTempView("sjs_emb")
    val df = spark.sql(
      """SELECT vec_id AS v1, vec_id_r AS v2, cos
        |FROM graft_similarity_join('sjs_emb', 'vec_id', 'v',
        |                           'sjs_emb', 'vec_id', 'v', 0.4, 4, 64)
        |WHERE vec_id < vec_id_r""".stripMargin)
    val got = df.select("v1", "v2").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val e = corpus
    val expected = e
      .as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.CosineSimilarity.column(col("a.v"), col("b.v")) >= 0.4)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    assert(got === expected, s"missing=${expected -- got} extra=${got -- expected}")
    // cos column is addressable and ≥ threshold
    assert(df.filter(col("cos") < 0.4).count() === 0L)
  }

  test("TVF output names stay unique when data columns collide with cos and _r names") {
    graft.functions.GraftExtensions.register(spark)
    // a data column literally named `cos` and one named `vec_id_r` — the
    // worst case for the single-pass suffix scheme the TVF used to have
    corpus
      .withColumn("cos", lit(1.0))
      .withColumn("vec_id_r", col("vec_id"))
      .createOrReplaceTempView("sjs_clash_emb")
    val df = spark.sql(
      """SELECT * FROM graft_similarity_join('sjs_clash_emb', 'vec_id', 'v',
        |                                    'sjs_clash_emb', 'vec_id', 'v', 0.4, 4, 64)""".stripMargin)
    val names = df.columns.toSeq
    assert(names.distinct.size === names.size, s"duplicate output names: $names")
    // the similarity score owns the name `cos`; colliding data columns
    // are the ones renamed
    assert(names.count(_ == "cos") === 1)
    assert(df.filter(col("cos") < 0.4).count() === 0L)
  }

  test("self-join on shared lineage resolves (right side re-aliased)") {
    val e = corpus
    val out = SimilarityJoinOps
      .similarityJoin(e, "vec_id", "v", e, "vec_id", "v", threshold = 0.4, bitsPerBand = 4, bands = 64)
    // 2 columns per side (vec_id, v) + cos
    assert(out.columns.length === 5)
    // every vector matches itself at cos 1.0 → at least N rows
    assert(out.count() >= e.count())
  }

  test("vector-column validation rejects wrong names and types") {
    val e = corpus
    intercept[IllegalArgumentException] {
      SimilarityJoinOps.similarityJoin(e, "vec_id", "nope", e, "vec_id", "v", 0.5)
    }
    intercept[IllegalArgumentException] {
      SimilarityJoinOps.similarityJoin(e, "vec_id", "vec_id", e, "vec_id", "v", 0.5)
    }
  }
}
