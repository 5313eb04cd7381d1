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
    * whose row frequency exceeds `cap` BEFORE the self-join, bounding any
    * bucket's contribution to cap² pairs. A key shared by thousands of
    * rows is boilerplate — it carries ~no discriminating signal, and at
    * crawl scale one such mega-bucket alone is a quadratic blowup (the
    * exact-dedup stage upstream of any near-dup cascade removes the
    * identical-copy mass that creates most of them).
    *
    * Scale shape: one map-side-combined count per key, then a LEFT ANTI
    * join against the hot set — which is broadcastable by construction
    * (≤ N/cap keys can exceed cap). True near-dup pairs keep surfacing
    * through their other, colder keys; the residual false-negative risk
    * of a pair sharing ONLY hot keys is the documented trade every
    * production LSH join makes. Fixture caps are set above the measured
    * maxima (sf0.1: shingle doc-freq ≤ 25, band buckets ≤ ~300), so the
    * oracle gates prove the guard is a no-op on honest data.
    */
  def dropHotKeys(keyed: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    val hot = keyed
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__kfreq"))
      .filter(col("__kfreq") > cap)
      .select(keyCols.map(col): _*)
    keyed.join(broadcast(hot), keyCols, "left_anti")
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
