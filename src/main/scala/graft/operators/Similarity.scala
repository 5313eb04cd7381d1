package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Embedding-similarity operators over `embeddings` (64-dim
  * ARRAY<FLOAT>, FIXTURES.md §B) — the similarity-search half of the
  * LLM-pipeline surface.
  *
  * Cross-engine exactness: a float dot product is order-dependent in the
  * last ulps, so raw `Σ xᵢyᵢ` can never hash-match an oracle. Every
  * product here is floor-quantized to 1e-6 in IEEE-double space (integral
  * doubles sum exactly in any order — same scheme as graft.util.Exact),
  * making cosine bit-identical in Spark and DuckDB while preserving 6
  * decimal digits of the true metric. Ranking ties break on vec_id.
  *
  * Scale posture:
  * - brute-force top-K: the probe set broadcasts (K queries × 64 floats),
  *   the corpus streams — no shuffle of the corpus at all; per-query
  *   top-K via window over (query, cos). Exact, O(Q·N), the baseline any
  *   ANN result is measured against.
  * - IVF: coarse centroids from one tiny aggregation (VecAgg.VecSum —
  *   map-side partial, one 64-float buffer per cluster per partition),
  *   probe the nProbe nearest centroids, exact search inside probed
  *   clusters only. At 100 TB the corpus is bucketed by cluster id, so a
  *   probe reads nProbe buckets instead of the full table.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private val Dim = 64

  /** Float array → double array (promote BEFORE multiplying: float*float
    * would round differently than DuckDB's double path). */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Quantized dot product of two double arrays: Σ floor(xy·1e6 + ½)/1e6 —
    * exact and order-independent (integral-double summation). */
  private def qdot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => floor(x * y * lit(1000000.0) + lit(0.5))),
      lit(0.0),
      (acc, v) => acc + v
    ) / lit(1000000.0)

  val queries: Map[String, Q] = Map(
    // Brute-force exact cosine top-5 for probe vectors vec_id < 5, scored
    // by the NATIVE codegen expression (graft.functions.CosineSimilarity,
    // one fused loop — no intermediate arrays); its quantized arithmetic
    // is bit-identical to the HOF qdot formulation, which the DuckDB
    // oracle and CosineSimilaritySpec both pin.
    "sim_topk_cosine" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      val e = Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val probes = e
        .filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
      e.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(
          col("q_id"),
          col("vec_id"),
          graft.functions.CosineSimilarity.column(col("qv"), col("v")).as("cos")
        )
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("vec_id"), col("cos"))
        .orderBy(col("q_id"), col("rnk"))
    },

    // Embedding-cosine near-duplicate pairs: vectors closer than the
    // threshold are duplicate candidates. Exact all-pairs here (the
    // oracle-checkable form, scored by the native codegen expression —
    // upper-triangle only); at 100 TB the same verify runs on LSH/IVF
    // bucket candidates instead of the cross product (sim_ann_ivf is the
    // probe-side machinery).
    "dedup_embed_cosine" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      val e = Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      e.as("a")
        .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("v1"),
          col("b.vec_id").as("v2"),
          graft.functions.CosineSimilarity.column(col("a.v"), col("b.v")).as("cos")
        )
        .filter(col("cos") >= 0.4)
        .orderBy(col("v1"), col("v2"))
    },

    // Multimodal array-column aggregation: per label, exact counts +
    // quantized norm / leading-dimension means (proves ARRAY<FLOAT>
    // columns flow through scan → transform → agg → scalar outputs).
    "embed_stats" -> { (spark, dir) =>
      import graft.util.Exact._
      val e = Tables
        .embeddings(spark, dir)
        .select(col("label"), asDouble(col("embedding")).as("v"))
        .withColumn("norm", sqrt(qdot(col("v"), col("v"))))
      e.groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("norm")).as("sum_norm"),
          davg(element_at(col("v"), 1)).as("avg_d1"),
          davg(element_at(col("v"), 2)).as("avg_d2"),
          davg(element_at(col("v"), 3)).as("avg_d3")
        )
        .orderBy(col("label"))
    },

    // IVF approximate nearest neighbor: coarse-quantize the corpus into
    // per-label clusters (centroid = elementwise mean via the VecSum
    // Aggregator), probe the 3 nearest centroids per query, exact cosine
    // inside probed clusters. Approximate by construction → no SQL
    // oracle; recall vs the brute-force baseline is pinned by
    // SimilaritySpec (driver records the rows-only check).
    "sim_ann_ivf" -> { (spark, dir) =>
      val vecSum = udaf(
        new graft.functions.VecAgg.VecSum(Dim),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
      )
      val e = Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
        .withColumn("n2", qdot(col("v"), col("v")))
      // Coarse codebook: one centroid per label (k-means-style assignment
      // seeded by the label clusters the fixture encodes).
      val centroids = e
        .groupBy(col("label").as("cl"))
        .agg(vecSum(col("v")).as("sumv"), count(lit(1)).as("cn"))
        .select(col("cl"), transform(col("sumv"), s => s / col("cn")).as("cv"))
      val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"))
      // nProbe=3 nearest centroids per probe (tiny cross: Q × k).
      val wq = Window.partitionBy(col("q_id")).orderBy(col("cdist").asc, col("cl").asc)
      val probedClusters = probes
        .crossJoin(broadcast(centroids))
        .withColumn("cdist", -qdot(col("qv"), col("cv")) / sqrt(col("qn2") * qdot(col("cv"), col("cv"))))
        .withColumn("crn", row_number().over(wq))
        .filter(col("crn") <= 3)
        .select(col("q_id"), col("qv"), col("qn2"), col("cl"))
      // Exact search inside probed clusters only.
      val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
      probedClusters
        .join(e, probedClusters("cl") === e("label") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), (qdot(col("qv"), col("v")) / sqrt(col("qn2") * col("n2"))).as("cos"))
        .withColumn("rnk", row_number().over(wr).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("vec_id"), col("cos"))
        .orderBy(col("q_id"), col("rnk"))
    }
  )

  /** DuckDB spelling of the quantized dot product over DOUBLE[] lists. */
  private def duckQdot(a: String, b: String): String =
    s"(list_sum(list_transform(list_zip($a, $b), z -> floor(z[1]*z[2]*1000000.0 + 0.5)))::DOUBLE / 1000000.0)"

  val oracles: Map[String, String] = Map(
    "sim_topk_cosine" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |), n AS (
         |  SELECT vec_id, v, ${duckQdot("v", "v")} AS n2 FROM e
         |), scored AS (
         |  SELECT q.vec_id AS q_id, a.vec_id AS vec_id,
         |    ${duckQdot("q.v", "a.v")} / sqrt(q.n2 * a.n2) AS cos
         |  FROM n q JOIN n a ON q.vec_id < 5 AND a.vec_id <> q.vec_id
         |), ranked AS (
         |  SELECT q_id, vec_id, cos, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rnk
         |  FROM scored)
         |SELECT q_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin,
    "dedup_embed_cosine" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |), n AS (
         |  SELECT vec_id, v, ${duckQdot("v", "v")} AS n2 FROM e
         |)
         |SELECT a.vec_id AS v1, b.vec_id AS v2,
         |  ${duckQdot("a.v", "b.v")} / sqrt(a.n2 * b.n2) AS cos
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE ${duckQdot("a.v", "b.v")} / sqrt(a.n2 * b.n2) >= 0.4
         |ORDER BY v1, v2""".stripMargin,
    "embed_stats" ->
      s"""WITH e AS (
         |  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
         |), n AS (
         |  SELECT label, v, sqrt(${duckQdot("v", "v")}) AS norm FROM e
         |)
         |SELECT label, COUNT(*) AS n,
         |  (SUM(FLOOR(norm * 10000.0 + 0.5)) / 10000.0) AS sum_norm,
         |  ((SUM(FLOOR(v[1] * 10000.0 + 0.5)) / 10000.0) / COUNT(v[1])) AS avg_d1,
         |  ((SUM(FLOOR(v[2] * 10000.0 + 0.5)) / 10000.0) / COUNT(v[2])) AS avg_d2,
         |  ((SUM(FLOOR(v[3] * 10000.0 + 0.5)) / 10000.0) / COUNT(v[3])) AS avg_d3
         |FROM n GROUP BY label ORDER BY label""".stripMargin
  )
}
