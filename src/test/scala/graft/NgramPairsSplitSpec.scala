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

  test("id-DataFrame variant ≡ Column-predicate variant") {
    val docs = Tables.documents(spark, sf)
    val byCol = TextOps.ngramJaccardPairsIncr(
      docs, pmod(col("doc_id"), lit(5)) === 0, 3, 0.5)
    val byIds = TextOps.ngramJaccardPairsIncrByIds(
      docs, docs.filter(pmod(col("doc_id"), lit(5)) === 0).select("doc_id"), 3, 0.5)
    assert(pairSet(byIds) === pairSet(byCol))
  }
}
