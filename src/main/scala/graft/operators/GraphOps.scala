package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph computation — PageRank over a bipartite co-occurrence
  * graph, the second iterative operator family next to
  * [[DedupClusters]]' connected components (SURVEY §2.2 "iterative /
  * graph" posture).
  *
  * Exactness across engines: PageRank is a float fixed-point in every
  * textbook, which can never hash-match an oracle (per-node sums run in
  * shuffle order). Here ALL arithmetic is 64-bit integer on a 1e-12
  * score grid: damping is ×17/20 integer division, per-edge contribution
  * is floor(floor(s·17/20)/outdeg), and per-node accumulation sums exact
  * longs — associative and order-free, so Spark and DuckDB agree bit for
  * bit after any number of iterations. (All scores stay positive, so
  * truncating integer division IS floor on both engines.)
  *
  * Scale shape per iteration: one equi-join of scores onto edges (shuffle
  * on src — or co-partitioned if edges are bucketed by src at rest) and
  * one hash agg on dst with map-side partials; the node table never
  * materializes to the driver. Degrees are computed once before the loop.
  * Lineage is truncated per round like DedupClusters (localCheckpoint) so
  * a long run cannot accrete a plan of 2·iters joins.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Integer-grid PageRank. `edges` = directed (src: long, dst: long),
    * every node assumed to have ≥1 out-edge (true for the bidirectional
    * graphs this engine builds; dangling-node mass redistribution is out
    * of scope). Returns (id, score_q) on the 1e-12 grid where 1.0 ≡
    * 1e12. Damping 0.85 is the exact rational 17/20. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    // Materialize the edge list ONCE, already hash-partitioned on the
    // per-iteration join key. Without this the edge subtree (scan +
    // union + distinct — the expensive part) re-executes for deg, for
    // nodes, and inside EVERY iteration (iters+2 times total); with it,
    // each round's join reuses the checkpointed partitioning instead of
    // re-shuffling the (large) edge side. At cluster scale the same
    // effect comes from bucketing edges by src at rest; `reliable=true`
    // checkpointing (as in DedupClusters) is the executor-loss-tolerant
    // variant.
    val parts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val e = edges.repartition(parts, col("src")).localCheckpoint()
    // deg and nodes are NODE-sized and loop-invariant: materialize once
    // (they would otherwise re-aggregate the edge list every round).
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val nodes = e.select(col("src").as("id")).distinct().localCheckpoint()
    // Adaptive broadcast: checkpointed RDDs report no stats, so AQE
    // cannot make this call — gate on the ACTUAL node count (free: the
    // RDD is materialized). Small graphs broadcast the node-sized sides
    // and each round costs ONE shuffle (the dst aggregation); huge
    // graphs fall back to the co-partitioned shuffle join, which is the
    // only scale-safe spelling when scores no longer fit an executor.
    val nodeCount = nodes.count()
    val small = nodeCount <= 1000000L
    val degSide = if (small) broadcast(deg) else deg
    var scores = nodes.select(col("id"), lit(1000000000000L).as("score_q"))
    for (_ <- 1 to iters) {
      val scoreSide = if (small) broadcast(scores) else scores
      val contribs = scoreSide
        .join(e, col("id") === col("src"))
        .join(degSide, "src")
        .select(col("dst"), expr("(score_q * 17 DIV 20) DIV deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("mass"))
      scores = nodes
        .join(contribs, col("id") === col("dst"), "left")
        .select(col("id"), (lit(150000000000L) + coalesce(col("mass"), lit(0L))).as("score_q"))
        .localCheckpoint()
    }
    scores
  }

  val queries: Map[String, Q] = Map(
    // PageRank over the part↔supplier co-occurrence graph from lineitem
    // (nodes namespaced: part → 2k, supplier → 2k+1; every lineitem row
    // contributes both directions, so the graph is symmetric and no node
    // dangles). 3 iterations, top 20 nodes by score. The oracle unrolls
    // the same integer recurrence as three chained CTEs — a green hash
    // proves the distributed loop is EXACTLY the sequential definition.
    "graph_pagerank" -> { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
      val fwd = li.select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd
        .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      pageRank(edges, iters = 3)
        .orderBy(col("score_q").desc, col("id").asc)
        .limit(20)
        .select(col("id"), col("score_q"))
    }
  )

  /** One unrolled iteration: scores `prev` → new per-node mass. */
  private def duckIter(prev: String): String =
    s"""SELECT n.id,
       |  CAST(150000000000 + COALESCE(SUM(($prev.s * 17 // 20) // deg.d), 0) AS BIGINT) AS s
       |FROM nodes n
       |LEFT JOIN e ON e.dst = n.id
       |LEFT JOIN $prev ON $prev.id = e.src
       |LEFT JOIN deg ON deg.src = e.src
       |GROUP BY n.id""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH f AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
         |e AS (SELECT src, dst FROM f UNION SELECT dst, src FROM f),
         |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS id FROM e),
         |it0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS s FROM nodes),
         |it1 AS (${duckIter("it0")}),
         |it2 AS (${duckIter("it1")}),
         |it3 AS (${duckIter("it2")})
         |SELECT id, s AS score_q FROM it3
         |ORDER BY score_q DESC, id ASC LIMIT 20""".stripMargin
  )
}
