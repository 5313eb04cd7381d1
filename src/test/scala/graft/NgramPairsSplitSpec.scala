package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftSession, Tables}

/** Pins the shared-index refactor: ngramJaccardPairsSplit (one shingle
  * pass, localCheckpoint'ed index) must produce EXACTLY the pairs of the
  * two standalone generators — the old-corpus self-join and the
  * restricted incremental join — on the real documents fixture. */
class NgramPairsSplitSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("split generator ≡ standalone generators on the documents fixture") {
    val docs = Tables.documents(spark, sf)
    val isNew = pmod(col("doc_id"), lit(5)) === 0

    val (oldPairs, newPairs) = TextOps.ngramJaccardPairsSplit(docs, isNew, 3, 0.5)
    val oldStandalone = TextOps.ngramJaccardPairs(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), 3, 0.5)
    val newStandalone = TextOps.ngramJaccardPairsIncr(docs, isNew, 3, 0.5)

    assert(pairSet(oldPairs) === pairSet(oldStandalone), "old-corpus pairs diverged")
    assert(pairSet(newPairs) === pairSet(newStandalone), "incremental pairs diverged")
    // Orientation invariant: every pair canonical (d1 < d2), no dups.
    val np = newPairs.select("d1", "d2").collect()
    assert(np.forall(r => r.getLong(0) < r.getLong(1)))
    assert(np.length === np.distinct.length)
    // Exactly one endpoint set covers the batch: every new pair touches
    // a doc_id % 5 == 0 endpoint.
    assert(pairSet(newPairs).forall(p => p._1 % 5 == 0 || p._2 % 5 == 0))
    // And the two legs tile the full graph: old ∪ new = all pairs.
    val full = pairSet(TextOps.ngramJaccardPairs(docs, 3, 0.5))
    assert((pairSet(oldPairs) ++ pairSet(newPairs)) === full)
  }

  test("old leg's hot-key cap sees old rows only — the 500-vs-510 doc-freq boundary") {
    val s = spark
    import s.implicits._
    // A shingle S = "alpha beta gamma" with old doc-freq exactly 500
    // (kept: cap drops only freq > 500) that crosses to 510 once 10 new
    // docs arrive (dropped from any cap over the combined index). The
    // only pair above threshold is the old near-dup sentinel (9001,9002),
    // whose Jaccard is 0.5 WITH S counted and 0.2 without — so a cap
    // computed over the moving corpus would lose it from the old leg.
    val fillers = (1 to 498).map(i => (i.toLong, s"alpha beta gamma u${i}a u${i}b u${i}c"))
    val sentinels = Seq(
      (9001L, "alpha beta gamma delta epsilon"),
      (9002L, "alpha beta gamma delta zeta"))
    val news = (1 to 10).map(i => (10000L + i, s"alpha beta gamma n${i}x n${i}y"))
    val docs = (fillers ++ sentinels ++ news).toDF("doc_id", "text")
    val isNew = col("doc_id") >= 10000L

    val (oldPairs, newPairs) = TextOps.ngramJaccardPairsSplit(docs, isNew, 3, 0.5)
    val oldStandalone = TextOps.ngramJaccardPairs(docs.filter(!isNew), 3, 0.5)
    assert(pairSet(oldStandalone) === Set((9001L, 9002L)), "fixture must isolate the sentinel pair")
    assert(pairSet(oldPairs) === pairSet(oldStandalone),
      "old leg lost pairs at the cap boundary — its hot-key set must see old rows only")
    assert(pairSet(newPairs) === pairSet(TextOps.ngramJaccardPairsIncr(docs, isNew, 3, 0.5)),
      "new leg must keep full-index cap semantics, matching the incremental generator")
  }

  test("id-DataFrame variant ≡ Column-predicate variant") {
    val docs = Tables.documents(spark, sf)
    val byCol = TextOps.ngramJaccardPairsIncr(
      docs, pmod(col("doc_id"), lit(5)) === 0, 3, 0.5)
    val byIds = TextOps.ngramJaccardPairsIncrByIds(
      docs, docs.filter(pmod(col("doc_id"), lit(5)) === 0).select("doc_id"), 3, 0.5)
    assert(pairSet(byIds) === pairSet(byCol))
  }
}
