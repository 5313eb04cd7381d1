package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate detection at ingest — the stateful sibling of
  * batch SimHash dedup (operators/Dedup.scala) and the step beyond
  * Spark's built-in `dropDuplicates` (exact keys only).
  *
  * Shape: per-document 64-bit SimHash (pure in-row map — no per-shingle
  * explode, so it runs unchanged under readStream) → 13 pigeonhole
  * blocks of 5 bits (any pair within hamming ≤ 12 shares ≥1 identical
  * block — the same exact-candidate argument as the batch operator) →
  * `flatMapGroupsWithState` keyed by (block idx, block key): state holds
  * the bucket's recent (doc_id, simhash) fingerprints, each arriving doc
  * emits its near-dup pairs against them.
  *
  * Scale posture:
  * - state per bucket is CAPPED (drop-oldest) — the streaming analogue
  *   of SkewTools.dropHotKeys: a boilerplate mega-bucket cannot grow
  *   state or emit quadratically.
  * - optional ProcessingTimeTimeout (pair with a real trigger cadence)
  *   evicts idle buckets, so total state is bounded by
  *   (active buckets × cap) fingerprints of 16 bytes each.
  * - a pair sharing several blocks emits once per shared block;
  *   downstream `dropDuplicates` (or the batch verify stage) collapses
  *   multiplicity — same false-positive-costs-compute contract as every
  *   candidate generator in this engine.
  *
  * Determinism: the hash family is fixed (MurmurHash3 with two fixed
  * seeds packed to 64 bits), and within a micro-batch bucket the docs
  * process in doc_id order, so emitted pairs are a pure function of the
  * batch sequence.
  */
object StreamingDedup {

  /** 64-bit SimHash over positional 3-gram shingles of the
    * space-tokenized text (two fixed-seed 32-bit MurmurHash3 halves
    * packed to one long per shingle, sign-tallied per bit). */
  def simhash64(text: String): Long = {
    import scala.util.hashing.MurmurHash3
    val ws = text.split(" ")
    val tally = new Array[Int](64)
    var i = 0
    val n = math.max(0, ws.length - 2)
    val seen = new scala.collection.mutable.HashSet[Long]
    while (i < n) {
      val s = ws(i) + " " + ws(i + 1) + " " + ws(i + 2)
      val h = (MurmurHash3.stringHash(s, 0x9747b28c).toLong << 32) |
        (MurmurHash3.stringHash(s, 0x85ebca6b).toLong & 0xffffffffL)
      if (seen.add(h)) {
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  private val Blocks = 13
  private val BlockBits = 5

  case class BlockedDoc(blkIdx: Int, blkKey: Long, docId: Long, sim: Long)
  case class Pair(d1: Long, d2: Long, hamming: Int)
  case class BucketState(docs: List[(Long, Long)]) // (docId, sim), newest first

  /** Streaming near-dup pairs over `docs` = (doc_id: long, text: string).
    * Works identically on a batch DataFrame (useful for testing the
    * operator body without a stream). Emits (d1, d2, hamming ≤
    * maxHamming) with d1 < d2, with per-shared-block multiplicity.
    *
    * `idleTimeout = Some(duration)` evicts idle buckets via
    * ProcessingTimeTimeout — use it with a real `Trigger.ProcessingTime`
    * cadence (with the default as-fast-as-possible trigger, timeout
    * bookkeeping fires continuous empty micro-batches, and
    * `processAllAvailable` never settles — which is also why the default
    * here is None). With None, state is bounded by the bucket cap alone.
    */
  def nearDupPairs(
      docs: DataFrame,
      maxHamming: Int = 12,
      bucketCap: Int = 64,
      idleTimeout: Option[String] = None
  ): Dataset[Pair] = {
    val spark = docs.sparkSession
    import spark.implicits._

    // Docs too short to produce a 3-gram shingle have NO content
    // fingerprint (an all-zero tally would give every such doc the same
    // sim = 0 and pair them all as hamming-0 "duplicates") — they are
    // excluded here, exactly as the batch operator excludes them by
    // producing no shingle rows.
    val sims = docs
      .select(col("doc_id").cast("long"), col("text"))
      .filter(size(split(col("text"), " ")) >= 3)
      .map { r => (r.getLong(0), simhash64(r.getString(1))) }
      .toDF("doc_id", "sim")
    val blocked = sims
      .select(
        col("doc_id"),
        col("sim"),
        posexplode(array((0 until Blocks).map(b =>
          shiftrightunsigned(col("sim"), b * BlockBits).bitwiseAND(lit(31L))): _*))
          .as(Seq("blk_idx", "blk_key"))
      )
      .as[(Long, Long, Int, Long)]
      .map { case (docId, sim, blkIdx, blkKey) => BlockedDoc(blkIdx, blkKey, docId, sim) }

    val useTimeout = docs.isStreaming && idleTimeout.isDefined
    blocked
      .groupByKey(d => (d.blkIdx, d.blkKey))
      .flatMapGroupsWithState(
        OutputMode.Append,
        if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
      ) { (_: (Int, Long), rows: Iterator[BlockedDoc], state: GroupState[BucketState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var held = state.getOption.map(_.docs).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Pair]
          // doc_id order within the batch → deterministic emission
          rows.toSeq.sortBy(_.docId).foreach { d =>
            held.foreach { case (otherId, otherSim) =>
              if (otherId != d.docId) {
                val ham = java.lang.Long.bitCount(d.sim ^ otherSim)
                if (ham <= maxHamming)
                  out += (if (otherId < d.docId) Pair(otherId, d.docId, ham)
                          else Pair(d.docId, otherId, ham))
              }
            }
            held = ((d.docId, d.sim) :: held).take(bucketCap) // drop-oldest cap
          }
          state.update(BucketState(held))
          if (useTimeout) state.setTimeoutDuration(idleTimeout.get)
          out.iterator
        }
      }
  }

  /** VERIFIED near-dup pairs: the full operator a caller actually wants —
    * candidate generation (pigeonhole blocks + capped bucket state)
    * composed with the collapse of per-shared-block multiplicity, so each
    * (d1, d2) pair is emitted EXACTLY ONCE across blocks AND micro-
    * batches. The hamming distance itself is already exact (both full
    * 64-bit simhashes live in bucket state — pigeonholing only decides
    * WHO gets compared, never the distance), so dedup of the emissions is
    * the whole remaining verify step, matching the batch operator's
    * distinct-pairs contract.
    *
    * The collapse is a stateful `dropDuplicates` on the pair key: its
    * state grows with the number of DISTINCT near-dup pairs — the
    * operator's own output volume, the floor any exactly-once emitter
    * must hold. On an unbounded stream where old pairs stop mattering,
    * bound it with a watermark on an event-time column added upstream
    * (`dropDuplicatesWithinWatermark` semantics); the fixture contract
    * here is global exactness.
    */
  def nearDupPairsVerified(
      docs: DataFrame,
      maxHamming: Int = 12,
      bucketCap: Int = 64,
      idleTimeout: Option[String] = None
  ): Dataset[Pair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    nearDupPairs(docs, maxHamming, bucketCap, idleTimeout)
      .dropDuplicates("d1", "d2")
      .as[Pair]
  }
}
