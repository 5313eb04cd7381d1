package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

/** Streaming near-dup dedup (stateful SimHash LSH at ingest): near-dup
  * pairs must surface ACROSS micro-batches (the capability dropDuplicates
  * lacks — it only matches exact keys), the hamming cut must separate the
  * constructed near-dups from unrelated docs, and the bucket cap must
  * bound state under a boilerplate flood.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door and the bird sings in the tall tree all day long"
  private def mutate(words: Int): String = {
    val ws = base.split(" ")
    ws.take(ws.length - words).mkString(" ") + " " + Seq.fill(words)("zzz").mkString(" ")
  }
  private val unrelated =
    "completely different content about spark catalyst optimizer rules and the physical planning of distributed joins across executor partitions with shuffle exchange and broadcast variables in cluster mode"

  test("near-dup pairs surface across micro-batches; unrelated docs don't pair") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val pairs = StreamingDedup.nearDupPairs(in.toDF().toDF("doc_id", "text"))
    val q = pairs.writeStream.format("memory").queryName("sdedup_out").outputMode("append").start()
    try {
      in.addData((1L, base), (10L, unrelated))
      q.processAllAvailable()
      assert(spark.table("sdedup_out").count() === 0, "first batch has no pairs yet")
      // near-dup of doc 1 arrives TWO batches later
      in.addData((20L, unrelated + " extra tail words here"))
      q.processAllAvailable()
      in.addData((2L, mutate(2)))
      q.processAllAvailable()
      val got = spark
        .table("sdedup_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(got.contains((1L, 2L)), s"cross-batch near-dup (1,2) not found: $got")
      assert(!got.exists { case (a, b) => Set(a, b).intersect(Set(10L, 20L)).nonEmpty && Set(a, b).intersect(Set(1L, 2L)).nonEmpty },
        s"unrelated docs paired with near-dup family: $got")
    } finally q.stop()
  }

  test("batch-mode body agrees with the batch SimHash operator's hamming structure") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, base), (2L, mutate(2)), (3L, mutate(3)),
      (10L, unrelated), (11L, unrelated + " with a small tail change zz")
    ).toDF("doc_id", "text")
    val pairs = StreamingDedup
      .nearDupPairs(docs)
      .collect()
      .map(p => (p.d1, p.d2))
      .distinct
      .toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"near-dup family not fully paired: $pairs")
    assert(pairs.contains((10L, 11L)), s"second family not paired: $pairs")
    assert(!pairs.exists { case (a, b) => a <= 3 && b >= 10 }, s"families cross-paired: $pairs")
  }

  test("verified pairs: exactly one emission per pair across blocks and batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val verified = StreamingDedup.nearDupPairsVerified(docs)
    val q = verified.writeStream.format("memory").queryName("sdedup_v").outputMode("append").start()
    try {
      in.addData((1L, base))
      q.processAllAvailable()
      in.addData((2L, mutate(2)), (3L, mutate(3)))
      q.processAllAvailable()
      val rows = spark.table("sdedup_v").collect().map(r => (r.getLong(0), r.getLong(1)))
      // near-identical docs share MANY pigeonhole blocks — the raw
      // candidate stream emits the pair once per shared block; verified
      // output must collapse that to exactly one row per pair
      assert(rows.length === rows.distinct.length, s"duplicate emissions survived: ${rows.toSeq}")
      assert(rows.toSet === Set((1L, 2L), (1L, 3L), (2L, 3L)), s"wrong verified pairs: ${rows.toSeq}")
    } finally q.stop()
  }

  test("verified pairs in batch mode = raw candidates distinct (and raw has multiplicity)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, base), (2L, mutate(2)), (10L, unrelated)).toDF("doc_id", "text")
    val raw = StreamingDedup.nearDupPairs(docs).collect().map(p => (p.d1, p.d2))
    val verified = StreamingDedup.nearDupPairsVerified(docs).collect().map(p => (p.d1, p.d2))
    assert(raw.length > raw.distinct.length, "fixture should exercise per-block multiplicity")
    assert(verified.sorted.toSeq === raw.distinct.sorted.toSeq)
  }

  test("docs too short for a shingle never pair (no zero-fingerprint collisions)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "hello world"), (2L, "foo bar"), (3L, ""), (4L, base)
    ).toDF("doc_id", "text")
    assert(StreamingDedup.nearDupPairs(docs).count() === 0,
      "sub-shingle docs produced pairs — the zero-fingerprint guard regressed")
  }

  test("bucket cap bounds emissions under a boilerplate flood") {
    val s = spark
    import s.implicits._
    val flood = (1L to 500L).map(i => (i, base)).toDF("doc_id", "text")
    val n = StreamingDedup.nearDupPairs(flood, bucketCap = 8).count()
    // uncapped, 500 identical docs → 13 blocks × C(500,2) ≈ 1.6M emissions;
    // with cap 8 each arrival pairs against ≤8 held fingerprints per block
    assert(n <= 500L * 8 * 13, s"cap failed to bound emissions: $n")
    assert(n > 0)
  }
}
