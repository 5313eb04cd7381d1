package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate PAIRS — the collapse step a
  * dedup pipeline runs after candidate verification: pairwise matches
  * (a,b),(b,c) must become ONE cluster {a,b,c} with one kept
  * representative, or transitive duplicates survive pairwise removal.
  *
  * Algorithm: iterative min-label propagation WITH POINTER JUMPING.
  * Every node starts labeled with itself; each round every node takes
  * the min of its own label, its neighbors' labels, and — the shortcut
  * (the chain-collapsing idea behind Shiloach/Vishkin pointer doubling
  * and Kiveris et al.'s star rewrites) — its LABEL'S label (labels are
  * always node ids, and a node's label only ever decreases, so lbl(lbl)
  * is a valid, ≤-valued, already-computed hop). Converged when a round
  * changes nothing. Plain propagation needs eccentricity rounds; the
  * label-of-label jump extends how far the component minimum travels
  * per round — measured r18 on the 0.4-threshold semantic pair graph (a
  * background-cosine continuum = long chains): 17 rounds plain, 12 with
  * the jump, identical labels (every CC oracle recomputes components
  * from scratch, so any divergence fails the hash-exact gates). The
  * textbook O(log d) doubling bound does NOT transfer — labels here are
  * n-hop-ball minima, not parent pointers (a second hop per round was
  * measured to buy nothing) — so the claim is the measured ~30% round
  * cut on chain-heavy graphs and no regression on quasi-cliques (2
  * rounds, unchanged). Each round is the edge join + agg plus one
  * node-sized self-join (the jump); the driver only coordinates the
  * loop on a metadata-scale changed-count, exactly how GraphX/MLlib
  * drive iterative algorithms. `localCheckpoint` truncates lineage per
  * round so plans stay flat.
  *
  * Edge prep is ONE shuffle (r18): union(both directions) →
  * repartition by src → in-place dropDuplicates (hash(src) satisfies
  * the (src, dst) clustering requirement, so the dedup agg rides the
  * repartition exchange instead of adding a (src, dst) one), and the
  * checkpoint pins hash(src) partitioning — the per-round edge-side
  * join then never re-shuffles the edge list (the pageRank lesson
  * applied here; at cluster scale the same effect comes from bucketing
  * edges by src at rest).
  */
object DedupClusters {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Cluster assignment for every node appearing in `pairs` (d1, d2):
    * returns (doc_id, rep) where rep = min doc_id of the component.
    *
    * @param reliableCheckpoint  lineage-truncation mode. `false` (default)
    *   uses `localCheckpoint` — executor-local blocks, no extra I/O, the
    *   right trade on a single node or short job, but an executor lost
    *   mid-loop loses its blocks and KILLS THE JOB (lineage is gone).
    *   `true` uses reliable `checkpoint()` to the SparkContext's
    *   checkpoint directory (caller must `setCheckpointDir` to a
    *   fault-tolerant FS — HDFS/S3 on a cluster): each round persists
    *   ~|V| labels, and the iteration survives executor loss — the
    *   setting a 100 TB multi-hour dedup run should use. Superseded
    *   per-round label generations and the edges are reclaimed as the
    *   loop goes; the CONVERGED labels stay reliable-backed in the
    *   returned frame, so the caller's own durable write (parquet, the
    *   maintenance loops' map store) still survives executor loss.
    *   After that write, call [[reclaimCheckpoint]] on the result to
    *   delete the last reliable generation — otherwise repeated runs in
    *   one application accumulate one label set per run.
    */
  /** Reliable-checkpoint paths backing `df`'s plan (local checkpoints
    * have no file and are excluded). */
  private def reliableCkptPaths(df: DataFrame): Seq[org.apache.hadoop.fs.Path] =
    df.queryExecution.analyzed
      .collect { case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }
      .flatMap(_.getCheckpointFile)
      .map(new org.apache.hadoop.fs.Path(_))

  private def deleteReliableCkpts(df: DataFrame): Unit =
    reliableCkptPaths(df).foreach { p =>
      p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }

  /** Delete the reliable checkpoint files backing a reliable-mode
    * result. Call AFTER the result has been durably written (parquet,
    * a maintenance map store): the files are the crash-recovery source
    * for that write, and they are not reclaimed automatically
    * (cleanCheckpoints is off by default and GC-timing-dependent when
    * on), so a loop that skips this accumulates one converged label set
    * per run. No-op for local-checkpoint-backed frames. */
  def reclaimCheckpoint(result: DataFrame): Unit = deleteReliableCkpts(result)

  def connectedComponents(
      pairs: DataFrame,
      maxIter: Int = 20,
      reliableCheckpoint: Boolean = false
  ): DataFrame = {
    // dropOriginStats: Spark 4 checkpoints PRESERVE the source plan's
    // estimated Statistics, and this loop's next-round estimate is a
    // product over the previous round's (the labels frame joins into its
    // own successor twice — propagation and jump) — geometric BigInt
    // growth that stalls the driver in stats arithmetic by round ~10
    // (see PlanBridge.dropOriginStats). Every round restarts from the
    // conservative default estimate instead.
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.PlanBridge.dropOriginStats(
        if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint())
    // Reliable mode writes ~|V| labels to the checkpoint FS every round
    // and Spark never deletes superseded generations on its own — a
    // 20-round run would hold 20 dead label sets until someone wipes
    // the directory. Each round therefore deletes the PREVIOUS round's
    // label checkpoint once the new one has materialized; the edges are
    // reclaimed at convergence (the final labels' checkpoint no longer
    // depends on them); the final labels' own reclamation is the
    // CALLER's, after its durable write — see [[reclaimCheckpoint]].
    def deleteCkpt(df: DataFrame): Unit =
      if (reliableCheckpoint) deleteReliableCkpts(df)
    val parts = pairs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val edges = ckpt(
      pairs
        .select(col("d1").as("src"), col("d2").as("dst"))
        .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
        .repartition(parts, col("src"))
        .dropDuplicates("src", "dst"))
    var labels = ckpt(
      edges
        .select(col("src").as("node"))
        .distinct()
        .withColumn("lbl", col("node")))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val candidates = edges
        .join(labels, edges("src") === labels("node"))
        .groupBy(col("dst"))
        .agg(min(col("lbl")).as("cand"))
      // propagation min: own label vs best neighbor label
      val prop = labels
        .join(candidates, labels("node") === candidates("dst"), "left")
        .select(col("node"), col("lbl"), least(col("lbl"), coalesce(col("cand"), col("lbl"))).as("plbl"))
      // pointer jump: follow the (old-generation) label one hop — labels
      // are node ids and only decrease, so lbl(plbl) is ≤ plbl and
      // already-computed. One node-sized join per round against the
      // edge-sized propagation join. Measured r18 on the 0.4-threshold
      // semantic graph: 17 rounds plain, 12 with the hop; a SECOND hop
      // bought nothing (labels are n-hop-ball minima, not parent
      // pointers, so the textbook doubling bound does not apply — the
      // honest gain is the measured ~30% round cut, not O(log d)).
      // The changed-count rides the checkpoint's own materialization as
      // an observed metric (r19): the former `next.filter(moved).count()`
      // was one extra driver job PER ROUND across the whole CC-composed
      // family — the scaling block's anti-scaling constant. CollectMetrics
      // accumulators fill while the checkpoint action executes the plan,
      // so queryExecution.observedMetrics is available without any
      // further job (and without the blocking Observation listener).
      val withMoved = prop
        .join(
          labels.select(col("node").as("__jn"), col("lbl").as("__jl")),
          col("plbl") === col("__jn"),
          "left")
        .select(
          col("node"),
          least(col("plbl"), coalesce(col("__jl"), col("plbl"))).as("lbl"),
          (least(col("plbl"), coalesce(col("__jl"), col("plbl"))) < col("lbl")).as("moved")
        )
        .observe(
          s"cc_changed_$iter",
          coalesce(sum(when(col("moved"), 1L).otherwise(0L)), lit(0L)).as("changed"))
      val next = ckpt(withMoved)
      changed = withMoved.queryExecution.observedMetrics
        .get(s"cc_changed_$iter").map(_.getLong(0))
        .getOrElse(next.filter(col("moved")).count()) // defensive fallback
      deleteCkpt(labels) // superseded generation; `next` is materialized
      labels = next.drop("moved")
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    log.info(s"connectedComponents converged in $iter rounds")
    // The converged labels stay reliable-backed (the caller's durable
    // write recovers from them on executor loss); only the edges — no
    // longer in any surviving lineage — reclaim here.
    deleteCkpt(edges)
    labels.select(col("node").as("doc_id"), col("lbl").as("rep"))
  }

  /** Per-cluster summary: (rep, n_members), members ≥ 2 by construction
    * (only nodes that appear in a pair are clustered). */
  def clusters(pairs: DataFrame, maxIter: Int = 20, reliableCheckpoint: Boolean = false): DataFrame =
    connectedComponents(pairs, maxIter, reliableCheckpoint)
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_members"))

  /** INCREMENTAL connected components: fold a batch of new pairs into an
    * existing cluster map without re-running CC over the full graph —
    * the maintenance loop a continuously-ingesting dedup pipeline needs
    * (the cluster-map sibling of TextOps.incrementalDedup's fingerprint
    * store; the scale mitigation for split_leakproof's full-graph CC).
    *
    * Only components TOUCHED by a new edge can change, so the iteration
    * runs over: (a) the touched components' members, rewritten as STAR
    * EDGES (member → rep) — the depth-1 form the converged map already
    * encodes, so propagation re-converges in ~2 rounds regardless of the
    * original graph's diameter; (b) the new pairs themselves. Untouched
    * rows of the old map pass through with zero iteration. Min-label
    * reps make the merge exact: the result is row-for-row identical to
    * `connectedComponents(oldPairs ∪ newPairs)` (DedupClustersSpec and
    * the dedup_incr_clusters oracle pin this).
    *
    * Cost at 100 TB: O(|new pairs| + |affected members|) per batch vs
    * O(|all pairs| × diameter) for a rebuild — the dominant untouched
    * mass is one left-anti join (bucket-joinable if the map is laid out
    * by rep).
    *
    * @param oldMap   converged (doc_id, rep) map — MUST itself be a CC
    *                 output (star-shaped, min-label reps)
    * @param newPairs (d1, d2) near-dup pairs with at least one endpoint
    *                 outside or touching the old graph
    */
  def augment(
      oldMap: DataFrame,
      newPairs: DataFrame,
      maxIter: Int = 20,
      reliableCheckpoint: Boolean = false
  ): DataFrame = {
    // newPairs feeds three separate consumers (touched-node set, the CC
    // edge list, the final union) — materialize ONCE here or the
    // caller's candidate-generation join (new-batch index × full index)
    // re-executes per consumer. Same truncation trade as the CC loop:
    // local blocks by default, reliable checkpoint for cluster runs.
    val np0 = newPairs.select(col("d1"), col("d2"))
    val np = if (reliableCheckpoint) np0.checkpoint() else np0.localCheckpoint()
    val touched = np.select(col("d1").as("doc_id"))
      .union(np.select(col("d2").as("doc_id")))
      .distinct()
    // touchedReps is rep-cardinality small and feeds the final result
    // lazily — materialize it so np's reliable files can reclaim below
    // without waiting on the caller
    val touchedReps = oldMap
      .join(touched, Seq("doc_id"), "left_semi")
      .select(col("rep"))
      .distinct()
      .localCheckpoint()
    val affectedOld = oldMap.join(touchedReps, Seq("rep"), "left_semi")
    val starEdges = affectedOld
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("d1"), col("rep").as("d2"))
    val merged = connectedComponents(
      starEdges.unionByName(np),
      maxIter, reliableCheckpoint)
    if (reliableCheckpoint) {
      // merged's final labels are checkpoint-backed (CC materializes
      // eagerly) and touchedReps is local — np's reliable files are out
      // of every surviving lineage and reclaim now; the RESULT's
      // reclamation stays with the caller ([[reclaimCheckpoint]] after
      // its durable write), like connectedComponents'.
      deleteReliableCkpts(np)
    }
    oldMap
      .join(touchedReps, Seq("rep"), "left_anti")
      .select(col("doc_id"), col("rep"))
      .unionByName(merged)
  }
}
