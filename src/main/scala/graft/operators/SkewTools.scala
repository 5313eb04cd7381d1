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
