package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DistributedRank

/** Pins DistributedRank.withGlobalNtile ≡ SQL NTILE for every bucket
  * remainder case — especially N % buckets ≠ 0, where SQL front-loads the
  * remainder (first N mod b buckets get the extra row) and the naive
  * ⌊(i−1)·b/N⌋+1 closed form would spread it evenly and diverge
  * (e.g. N=150, b=4: rank 76 is bucket 3 under the closed form but
  * bucket 2 under NTILE).
  */
class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def check(n: Int, buckets: Int): Unit = {
    val s = spark
    import s.implicits._
    // shuffled insertion order so range partitioning actually reorders
    val df = scala.util.Random
      .shuffle((1 to n).toList)
      .map(i => (i.toLong, s"row_$i"))
      .toDF("k", "payload")
    val got = DistributedRank
      .withGlobalNtile(df, buckets, Seq(col("k").asc), rankCol = "grank", ntileCol = "nt", numPartitions = 4)
      .select(col("k"), col("grank"), col("nt"))
    val expected = df
      .select(
        col("k"),
        row_number().over(Window.orderBy(col("k"))).cast("long").as("grank"),
        ntile(buckets).over(Window.orderBy(col("k"))).cast("long").as("nt")
      )
    val g = got.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e = expected.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.length === n)
    val diffs = g.zip(e).filter { case (a, b) => a != b }
    assert(diffs.isEmpty, s"N=$n b=$buckets diverges from SQL NTILE at: ${diffs.take(5).mkString(", ")}")
  }

  test("matches SQL NTILE when N divisible by buckets (N=100, b=4)") { check(100, 4) }
  test("matches SQL NTILE with remainder (N=150, b=4 — the ADVICE counterexample)") { check(150, 4) }
  test("matches SQL NTILE with remainder (N=7, b=3)") { check(7, 3) }
  test("matches SQL NTILE with remainder (N=103, b=8)") { check(103, 8) }
  test("matches SQL NTILE when N < buckets (N=3, b=5)") { check(3, 5) }

  test("withGlobalCumMinExclusive ≡ single-window exclusive running min at every partition count") {
    val s = spark
    import s.implicits._
    // values descend then jump so the running min both moves and stalls;
    // shuffled insertion order so range partitioning actually reorders.
    val df = scala.util.Random
      .shuffle((1 to 257).toList)
      .map(i => (i.toLong, ((i * 7919) % 101 - 50).toLong))
      .toDF("k", "v")
    val expected = df
      .select(col("k"), min(col("v")).over(
        Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)).as("pm"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
    for (np <- Seq(1, 3, 4, 16)) {
      val got = DistributedRank
        .withGlobalCumMinExclusive(df, "v", Seq(col("k").asc), cumCol = "pm", numPartitions = np)
        .select(col("k"), col("pm"))
        .orderBy("k").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      // first row in the total order must be NULL (no preceding rows)
      assert(got.head._2 == null)
      assert(got.sameElements(expected), s"numPartitions=$np diverges")
    }
  }

  test("withGlobalCumSum matches window-SUM null semantics on a null-leading prefix") {
    val s = spark
    import s.implicits._
    // first 40 rows in the total order carry NULL v, then values with
    // interleaved nulls — SQL window SUM is NULL over the all-null prefix
    // and skips nulls afterwards.
    val df = scala.util.Random
      .shuffle((1 to 257).toList)
      .map { i =>
        val v: java.lang.Long =
          if (i <= 40 || i % 11 == 0) null else java.lang.Long.valueOf((i % 13 + 1).toLong)
        (i.toLong, v)
      }
      .toDF("k", "v")
    val expected = df
      .select(col("k"), sum(col("v")).over(
        Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
    for (np <- Seq(1, 3, 4, 16)) {
      val got = DistributedRank
        .withGlobalCumSum(df, "v", Seq(col("k").asc), cumCol = "cum", numPartitions = np)
        .select(col("k"), col("cum"))
        .orderBy("k").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      assert(got.head._2 == null, s"numPartitions=$np: null-leading prefix must stay NULL")
      assert(got.sameElements(expected), s"numPartitions=$np diverges")
    }
  }

  test("withPerKeyRank keeps a NULL-keyed group correct across partition boundaries") {
    val s = spark
    import s.implicits._
    // one huge NULL-keyed group (spans every range partition when keyCol
    // leads the sort) plus a few ordinary keys — each row must get a
    // distinct, dense 1..n rank within its group.
    val df = scala.util.Random
      .shuffle((1 to 300).toList)
      .map { i =>
        val key: java.lang.Long = if (i <= 200) null else java.lang.Long.valueOf((i % 3).toLong)
        (key, i.toLong)
      }
      .toDF("key", "ord")
    val expected = df
      .select(col("key"), col("ord"), row_number().over(
        Window.partitionBy(col("key")).orderBy(col("ord"))).cast("long").as("rnk"))
      .orderBy(col("key").asc_nulls_first, col("ord"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0), r.getLong(1), r.getLong(2)))
    for (np <- Seq(3, 4, 16)) {
      val got = DistributedRank
        .withPerKeyRank(df, "key", Seq(col("key").asc_nulls_first, col("ord").asc),
          rankCol = "rnk", numPartitions = np)
        .select(col("key"), col("ord"), col("rnk"))
        .orderBy(col("key").asc_nulls_first, col("ord"))
        .collect()
        .map(r => (if (r.isNullAt(0)) null else r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.sameElements(expected), s"numPartitions=$np diverges on the NULL-keyed group")
    }
  }

  test("withGlobalCumSum ≡ single-window running sum at every partition count") {
    val s = spark
    import s.implicits._
    val df = scala.util.Random
      .shuffle((1 to 257).toList)
      .map(i => (i.toLong, (i % 13 + 1).toLong))
      .toDF("k", "v")
    val expected = df
      .select(col("k"), sum(col("v")).over(
        Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    for (np <- Seq(1, 3, 4, 16)) {
      val got = DistributedRank
        .withGlobalCumSum(df, "v", Seq(col("k").asc), cumCol = "cum", numPartitions = np)
        .select(col("k"), col("cum"))
        .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sameElements(expected), s"numPartitions=$np diverges")
    }
  }
}
