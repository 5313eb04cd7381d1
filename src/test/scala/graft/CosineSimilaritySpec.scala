package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CosineSimilarity, GraftExtensions}

/** The native codegen expression must be bit-identical to the composed
  * HOF formulation (zip_with → floor-quantize → aggregate), on real
  * fixture vectors and on edge cases (zero vector → NULL), and must run
  * inside WholeStageCodegen (no CodegenFallback in the plan).
  */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    GraftExtensions.register(s)
    s
  }

  private def hofCos(a: String, b: String) = {
    def q(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, r) => floor(p * r * 1000000.0 + 0.5)), lit(0.0), (acc, v) => acc + v) / 1000000.0
    q(col(a), col(b)) / sqrt(q(col(a), col(a)) * q(col(b), col(b)))
  }

  test("expression ≡ HOF formulation, bit-exact on all fixture pairs (5 probes × 500)") {
    val e = Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    val both = e
      .crossJoin(broadcast(probes))
      .select(
        CosineSimilarity.column(col("qv"), col("v")).as("native"),
        hofCos("qv", "v").as("hof")
      )
    val bad = both.filter(!(col("native") <=> col("hof"))).count()
    assert(bad === 0, s"$bad pairs diverge between native expression and HOF")
  }

  test("zero vector yields NULL, not NaN") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = df.select(CosineSimilarity.column(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val e = Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(CosineSimilarity.column(col("v"), col("v")).as("c"))
    val plan = e.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    assert(
      plan.linesIterator.exists(l => l.trim.matches("""\*\(\d+\) Project \[graft_cosine.*""")),
      s"graft_cosine not inside a codegen stage:\n$plan"
    )
    // and the expression evaluates correctly through that path
    assert(e.filter(col("c") > 0.999).count() > 0)
  }
}
