package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewTools

/** The hot-bucket guard (SkewTools.dropHotKeys) under crawl-shaped skew:
  * a corpus where thousands of rows share one boilerplate key would make
  * the candidate self-join quadratic in the bucket (2000 copies → ~2M
  * pairs from ONE bucket). The cap drops such keys before the join and
  * the pair count collapses to the honest co-occurrence structure, while
  * keys at-or-below the cap are untouched.
  */
class DedupSkewSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("dropHotKeys bounds a boilerplate mega-bucket self-join") {
    val s = spark
    import s.implicits._
    // 2000 rows share the boilerplate key; 50 honest pairs share distinct keys
    val boiler = (1L to 2000L).map(i => (i, "BOILERPLATE"))
    val honest = (1L to 50L).flatMap(i => Seq((10000L + 2 * i, s"key_$i"), (10001L + 2 * i, s"key_$i")))
    val keyed = (boiler ++ honest).toDF("doc_id", "s")

    def pairs(df: org.apache.spark.sql.DataFrame): Long =
      df.as("a")
        .join(df.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .count()

    assert(pairs(keyed) === 2000L * 1999 / 2 + 50, "uncapped join is quadratic in the mega-bucket")
    val capped = SkewTools.dropHotKeys(keyed, Seq("s"), cap = 100)
    assert(pairs(capped) === 50L, "cap must drop only the mega-bucket, keeping honest pairs")
  }

  test("dropHotKeys keeps buckets at exactly the cap (absolute mode, skewMultiple = 1)") {
    val s = spark
    import s.implicits._
    val keyed = ((1L to 100L).map(i => (i, "at_cap")) ++ Seq((200L, "cold"))).toDF("doc_id", "s")
    assert(SkewTools.dropHotKeys(keyed, Seq("s"), cap = 100, skewMultiple = 1).count() === 101L)
    assert(SkewTools.dropHotKeys(keyed, Seq("s"), cap = 99, skewMultiple = 1).count() === 1L)
  }

  test("uniformly loaded low-entropy key space is load, not skew: nothing dropped") {
    val s = spark
    import s.implicits._
    // 16 keys × 1000 rows each — every bucket far above cap=100, but all
    // identical: an absolute-only cap would drop EVERYTHING here
    val keyed = (1L to 16000L).map(i => (i, s"k${i % 16}")).toDF("doc_id", "s")
    assert(SkewTools.dropHotKeys(keyed, Seq("s"), cap = 100).count() === 16000L)
    // one genuinely anomalous bucket on top of the uniform load IS dropped
    val skewed = keyed.union((20000L to 60000L).map(i => (i, "boiler")).toDF("doc_id", "s"))
    val kept = SkewTools.dropHotKeys(skewed, Seq("s"), cap = 100).count()
    assert(kept === 16000L, s"expected the 40k-row boiler bucket dropped and uniform load kept, got $kept")
  }

  test("capped LSH candidate join stays bounded on a cloned-vector corpus") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val clone = Seq.fill(64)(rnd.nextGaussian())
    // 500 identical clones (every band collides) + 100 distinct vectors
    val e = ((0 until 500).map(i => (i.toLong, clone)) ++
      (500 until 600).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian())))).toDF("vec_id", "v")
    val capped = operators.Similarity.lshCandidates(e, bitsPerBand = 10, bands = 25, cap = 100)
    val nCapped = capped.count()
    // the clone block alone would contribute 500*499/2 ≈ 125k pairs/band uncapped
    assert(nCapped < 20000L, s"capped LSH still produced $nCapped candidate pairs")
  }
}
