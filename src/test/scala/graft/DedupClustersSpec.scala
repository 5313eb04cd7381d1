package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupClusters

/** Min-label propagation connected components: transitive chains
  * collapse to one cluster, disjoint families stay apart, and a long
  * path (worst-case diameter) still converges.
  */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    DedupClusters
      .connectedComponents(pairs.toDF("d1", "d2"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("transitive chain collapses to one cluster; disjoint family stays apart") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L)
    assert(got(10L) === 10L && got(11L) === 10L)
  }

  test("two clusters bridged by one pair merge") {
    val got = comps(Seq((1L, 2L), (3L, 4L), (2L, 3L)))
    assert(got.values.toSet === Set(1L))
  }

  test("long path (diameter 19) converges under the iteration cap") {
    val chain = (1L until 20L).map(i => (i, i + 1))
    val got = comps(chain)
    assert(got.values.toSet === Set(1L))
    assert(got.size === 20)
  }

  test("reliable checkpoint mode: same clusters, RDD checkpoint files written") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val reliableDf = DedupClusters.connectedComponents(pairs, reliableCheckpoint = true)
    val reliable = reliableDf
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val local = DedupClusters
      .connectedComponents(pairs)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(reliable === local)
    assert(reliable.values.toSet === Set(1L, 10L))
    def rddDirs(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap {
        case d if d.isDirectory && d.getName.startsWith("rdd-") => Seq(d)
        case d if d.isDirectory                                 => rddDirs(d)
        case _                                                  => Nil
      }
    // the per-iteration generations and edges reclaim as the loop goes;
    // exactly the CONVERGED labels survive — they are the caller's
    // crash-recovery source until its own durable write completes
    val survivors = rddDirs(new java.io.File(dir))
    assert(
      survivors.size == 1,
      s"expected only the converged labels' checkpoint to survive, got ${survivors.map(_.getName)}")
    // ... after which reclaimCheckpoint must leave the FS empty, so
    // repeated runs in one application accumulate nothing
    DedupClusters.reclaimCheckpoint(reliableDf)
    assert(rddDirs(new java.io.File(dir)).isEmpty,
      "reclaimCheckpoint left reliable label files behind")
  }

  test("augment equals full rebuild: bridge merges, new components, untouched passthrough, rep takeover") {
    val s = spark
    import s.implicits._
    // Old graph: {1,2,3}, {10,11}, {20,21} (untouched).
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val oldMap = DedupClusters.connectedComponents(oldPairs.toDF("d1", "d2"))
    // New batch: bridges {1..3}↔{10,11}, adds a fresh component {30,31},
    // and attaches 0 to {1..3} — 0 < 1 forces a rep TAKEOVER.
    val newPairs = Seq((3L, 10L), (30L, 31L), (0L, 1L))
    val got = DedupClusters
      .augment(oldMap, newPairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = DedupClusters
      .connectedComponents((oldPairs ++ newPairs).toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === full, "incremental result diverged from batch rebuild")
    assert(got(11L) === 0L, "bridged+taken-over component must relabel to the new min id")
    assert(got(20L) === 20L && got(21L) === 20L, "untouched component must pass through")
    assert(got(30L) === 30L && got(31L) === 30L)
  }

  test("augment with pairs touching no old component = pure addition") {
    val s = spark
    import s.implicits._
    val oldMap = DedupClusters.connectedComponents(Seq((1L, 2L)).toDF("d1", "d2"))
    val got = DedupClusters
      .augment(oldMap, Seq((5L, 6L)).toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("property: augment equals full rebuild on 20 seeded random graph/batch splits") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 20) {
      val nNodes = 4 + rnd.nextInt(20)
      val nEdges = 1 + rnd.nextInt(2 * nNodes)
      val all = Seq.fill(nEdges) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      if (all.nonEmpty) {
        // Any partition of the edge set is a valid history: old edges
        // landed first, new edges arrive as the batch.
        val (oldE, newE) = all.partition(_ => rnd.nextBoolean())
        if (oldE.nonEmpty && newE.nonEmpty) {
          val oldMap = DedupClusters.connectedComponents(oldE.toDF("d1", "d2"))
          val got = DedupClusters.augment(oldMap, newE.toDF("d1", "d2"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val full = DedupClusters.connectedComponents(all.toDF("d1", "d2"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got === full,
            s"trial $trial diverged (old=$oldE new=$newE)")
        }
      }
    }
  }

  test("clusters summary counts members per representative") {
    val s = spark
    import s.implicits._
    val out = DedupClusters
      .clusters(Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out === Map(1L -> 3L, 10L -> 2L))
  }
}
