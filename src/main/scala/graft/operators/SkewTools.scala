package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY "salting for skew").
  *
  * AQE's skew-join splitting (on in GraftSession) handles most skew at
  * runtime; explicit salting remains the tool when one key dominates so
  * hard that even split partitions overwhelm a task, or when the join is
  * not a sort-merge AQE can rewrite. Mechanics: the skewed (large) side
  * gets a random-but-deterministic salt in [0, buckets); the small side
  * is EXPLODED ×buckets so every (key, salt) pair exists; the join key
  * becomes (key, salt) — one hot key fans out over `buckets` tasks.
  * Deterministic salt (hash of a unique column, not rand()) keeps reruns
  * and retries consistent.
  */
object SkewTools {

  /** Large, skewed side: add a deterministic salt column derived from a
    * unique id column. */
  def saltLarge(df: DataFrame, uniqueCol: String, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(buckets)).cast("int"))

  /** Small side: replicate each row once per salt value. */
  def explodeSmall(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))

  /** Hot-bucket guard for candidate-generating self-joins (LSH bands,
    * SimHash blocks, shingle/fingerprint inverted indexes): drop keys
    * whose row frequency exceeds the hot threshold BEFORE the self-join,
    * bounding any bucket's contribution to threshold² pairs. A key shared
    * by vastly more rows than its peers is boilerplate — it carries ~no
    * discriminating signal, and at crawl scale one such mega-bucket alone
    * is a quadratic blowup (the exact-dedup stage upstream of any
    * near-dup cascade removes the identical-copy mass that creates most
    * of them).
    *
    * Hot means ANOMALOUS, not merely large: the threshold is
    * `max(cap, skewMultiple × mean bucket size)`, so a LOW-ENTROPY key
    * space whose buckets are uniformly big (a 4-bit LSH band key has 16
    * possible values — every bucket holds ~N/16 rows once N exceeds
    * 16×cap) is treated as load, not skew. An absolute-only cap would
    * cross that line and silently drop EVERY bucket, collapsing the
    * dedup output to empty at exactly the scale the guard exists for.
    * Set `skewMultiple = 1` to recover pure absolute-cap behavior.
    *
    * Scale shape: one map-side-combined count per key, a one-row mean
    * aggregate, then a LEFT ANTI join against the hot set — which is
    * broadcastable by construction (≤ N/threshold keys can exceed the
    * threshold). True near-dup pairs keep surfacing through their other,
    * colder keys; the residual false-negative risk of a pair sharing
    * ONLY hot keys is the documented trade every production LSH join
    * makes. Fixture caps sit above the measured maxima (sf0.1: shingle
    * doc-freq ≤ 25, band buckets ≤ ~300), so the oracle gates prove the
    * guard is a no-op on honest data.
    */
  def dropHotKeys(
      keyed: DataFrame,
      keyCols: Seq[String],
      cap: Int,
      skewMultiple: Int = 8
  ): DataFrame = {
    val counts = keyed
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__kfreq"))
    val meanFreq = counts.agg(avg(col("__kfreq")).as("__kmean"))
    val hot = counts
      .crossJoin(broadcast(meanFreq))
      .filter(col("__kfreq") > greatest(lit(cap.toDouble), lit(skewMultiple.toDouble) * col("__kmean")))
      .select(keyCols.map(col): _*)
    keyed.join(broadcast(hot), keyCols, "left_anti")
  }

  /** Bloom-pruned LEFT SEMI join — exact semi-join semantics at a
    * fraction of the shuffle. A Bloom filter over the small side's keys
    * (one pass, ~1.2 MB per million keys at 1% fpp) is probed INSIDE
    * whole-stage codegen on the big side (functions.BloomMightContain),
    * so only the ~match-fraction + fpp survivors reach the exact semi
    * join. False positives are removed by that join; Bloom false
    * negatives cannot occur — the pruning is invisible to semantics.
    *
    * 100 TB shape: the big side never shuffles its non-matching mass —
    * the dominant cost of a semi join against a selective dimension —
    * and the filter rides the task binary (broadcast) rather than a
    * join. This is the manual spelling of Spark's runtime row-level
    * filtering, usable where the injected version doesn't fire (no
    * selective creation-side predicate, DataFrame-built plans, probes
    * smaller than the injection thresholds).
    *
    * Integral keys are cast to long on BOTH sides (build and probe must
    * hash identically); string keys pass through.
    */
  def bloomSemiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    def keyed(df: DataFrame, k: String): Column =
      df.schema(k).dataType match {
        case StringType => col(k)
        case LongType   => col(k)
        case _          => col(k).cast("long")
      }
    val bloom = small.select(keyed(small, smallKey).as(smallKey)).stat
      .bloomFilter(smallKey, math.max(1L, expectedKeys), fpp)
    val bridge = org.apache.spark.sql.graftbridge.PlanBridge
    val pruned = big.filter(
      bridge.column(
        graft.functions.BloomMightContain(bridge.expression(keyed(big, bigKey)), bloom)))
    pruned.join(
      small.select(keyed(small, smallKey).as("__bsk")).distinct(),
      keyed(pruned, bigKey) === col("__bsk"),
      "left_semi")
  }

  /** Salted inner equi-join on `key` — semantically identical to the
    * unsalted join, with the hot key spread across `buckets` tasks. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      uniqueCol: String,
      buckets: Int
  ): DataFrame = {
    val l = saltLarge(large, uniqueCol, buckets)
    val s = explodeSmall(small, buckets)
    l.join(s, l(key) === s(key) && l("__salt") === s("__salt"))
      .drop("__salt")
  }
}
