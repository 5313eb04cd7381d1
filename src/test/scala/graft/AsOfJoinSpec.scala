package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** Edge semantics of both as-of directions on hand-built inputs:
  * inclusive equal-timestamp matching, no-match rows surviving with null
  * payloads, and per-key isolation. (The fixture-scale behavior is
  * oracle-checked by join_asof / join_asof_forward; this pins the corner
  * cases a fixture may not hit.)
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def ts(m: Int) = new Timestamp(1704067200000L + m * 60000L)

  private def fixtures = {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 100L, ts(10)), // equal-ts match candidate
      (2L, 100L, ts(5)),  // before any right row
      (3L, 200L, ts(30)), // other key
      (4L, 300L, ts(30))  // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, ts(10), "r10"),
      (100L, ts(20), "r20"),
      (200L, ts(1), "s1")
    ).toDF("rk", "rt", "payload")
    (left, right)
  }

  test("backward as-of: latest at-or-before, inclusive; null when nothing precedes") {
    val (left, right) = fixtures
    val got = AsOfJoin
      .asOf(left, "k", "t", right, "rk", "rt", Seq("payload"))
      .select("id", "payload")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(got === Map(
      1L -> Some("r10"), // equal timestamp matches (inclusive)
      2L -> None,        // nothing at-or-before
      3L -> Some("s1"),  // per-key isolation
      4L -> None         // key absent on the right
    ))
  }

  test("forward as-of: earliest at-or-after, inclusive; null when nothing follows") {
    val (left, right) = fixtures
    val got = AsOfJoin
      .asOfForward(left, "k", "t", right, "rk", "rt", Seq("payload"))
      .select("id", "payload")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(got === Map(
      1L -> Some("r10"), // equal timestamp matches (inclusive)
      2L -> Some("r10"), // earliest following
      3L -> None,        // right rows all precede
      4L -> None
    ))
  }

  test("graft_asof_join TVF ≡ Scala API in both directions; collision rejected") {
    val (left, right) = fixtures
    graft.functions.GraftExtensions.register(spark)
    left.createOrReplaceTempView("asof_tvf_left")
    right.createOrReplaceTempView("asof_tvf_right")
    for (dir <- Seq("backward", "forward")) {
      val viaSql = spark
        .sql(s"""SELECT id, payload FROM graft_asof_join('asof_tvf_left', 'k', 't',
                |  'asof_tvf_right', 'rk', 'rt', 'payload', '$dir')""".stripMargin)
        .collect()
        .map(r => r.getLong(0) -> Option(r.getString(1)))
        .toMap
      val fn = if (dir == "backward") AsOfJoin.asOf _ else AsOfJoin.asOfForward _
      val viaScala = fn(left, "k", "t", right, "rk", "rt", Seq("payload"))
        .select("id", "payload")
        .collect()
        .map(r => r.getLong(0) -> Option(r.getString(1)))
        .toMap
      assert(viaSql === viaScala, s"direction=$dir")
    }
    // a payload name already on the left must be rejected, not shadowed
    val e = intercept[Exception] {
      spark.sql("""SELECT * FROM graft_asof_join('asof_tvf_left', 'k', 't',
                  |  'asof_tvf_right', 'rk', 'rt', 't', 'backward')""".stripMargin)
    }
    assert(e.getMessage.contains("collides"), s"wrong error: ${e.getMessage}")
  }
}
