package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.SimilarityJoinOps

/** The SIMILARITY JOIN engine feature: the SimilarityJoin logical node
  * must lower to the banded LSH plan (hash/sort-merge equi-join on band
  * keys — never a nested-loop cross product) and return exactly the
  * all-pairs reference result at band parameters with zero false
  * negatives for the data's similarity structure.
  */
class SimilarityJoinSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def corpus = Tables
    .embeddings(spark, sf)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

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

  test("the lowered plan is a banded equi-join: no nested-loop or cartesian, generators present") {
    val l = corpus.select(col("vec_id").as("lid"), col("v").as("lv"))
    val r = corpus.select(col("vec_id").as("rid"), col("v").as("rv"))
    val df = SimilarityJoinOps.similarityJoin(l, "lid", "lv", r, "rid", "rv", threshold = 0.9)
    val plan = df.queryExecution.executedPlan
    def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
        pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
      val sub = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      sub.collect(pf) ++ sub.subqueries.flatMap(collectAll(_)(pf))
    }
    val nestedLoops = collectAll(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nestedLoops.isEmpty, s"similarity join planned a cross product: $nestedLoops")
    val generators = collectAll(plan) { case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(generators.size === 2, s"expected 2 band-signature generators, got ${generators.size}")
    val hashJoins = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if !j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] => j
    }
    assert(hashJoins.nonEmpty, "no equi-join found in the lowered plan")
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
