package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{KeyedMoments, StreamingAnomaly}

/** Pins the batch/streaming symmetry of the anomaly operator: the state
  * StreamingAnomaly carries across micro-batches is INTEGER moments, so
  * after draining a stream it must equal the batch aggregation over the
  * same rows exactly — and the outlier predicate applied to that state
  * must flag exactly the rows the `evt_anomaly` batch query flags.
  */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("drained stream state equals batch moments bit-for-bit; flags match evt_anomaly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val rows = Tables
      .events(s, sf)
      .select(
        col("user_id"),
        floor(col("value") * 1000 + lit(0.5)).cast("long").as("v_q"),
        col("event_id"))
      .as[(Long, Long, Long)]
      .collect()
      .sortBy(_._3)

    // Stream the same rows in three micro-batches.
    val stream = MemoryStream[(Long, Long)]
    val out = StreamingAnomaly.runningMomentsByKey(stream.toDS())
    val q = out.writeStream.format("memory").queryName("moments").outputMode("update").start()
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
      stream.addData(chunk.map(r => (r._1, r._2)).toIndexedSeq: _*)
      q.processAllAvailable()
    }
    q.stop()

    // Latest state per key (Update mode re-emits; last write wins).
    val streamed = s
      .table("moments")
      .groupBy(col("key"))
      .agg(max(struct(col("n"), col("s"), col("q"))).as("m"))
      .select(col("key"), col("m.n"), col("m.s"), col("m.q"))
      .as[(Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> KeyedMoments(r._1, r._2, r._3, r._4))
      .toMap

    val batch = rows
      .groupBy(_._1)
      .map { case (k, vs) =>
        k -> KeyedMoments(k, vs.length.toLong, vs.map(_._2).sum, vs.map(v => v._2 * v._2).sum)
      }
    assert(streamed === batch, "streamed moments diverge from batch moments")

    // Outlier flags from the drained state ≡ the batch query's rows.
    val flaggedStream = rows
      .filter { case (u, vq, _) => streamed(u).isOutlier(vq) }
      .map(_._3)
      .toSet
    val flaggedBatch = SparkEntry
      .queries("evt_anomaly")(s, sf)
      .select(col("event_id"))
      .as[Long]
      .collect()
      .toSet
    assert(flaggedStream === flaggedBatch, "streamed flags diverge from evt_anomaly")
    assert(flaggedBatch.nonEmpty, "fixture produced no outliers — the equivalence is vacuous")
  }

  test("outlier predicate is exact where int64 product math would overflow") {
    // 5000 events split between two grid values ~1.6e6 and 1e6 (grid
    // values ~1600/1000 at the 1e-3 grid): the stored sums are
    // comfortably in range (s≈6.6e9, q≈9.2e15), but every cleared-
    // denominator product overflows int64 — n·q≈4.6e19, s²≈4.3e19, and
    // 4·(n·q−s²)≈1.0e19 wraps NEGATIVE, which made the old Long
    // spelling flag even the exact mean as an outlier. BigInt math must
    // keep both directions right.
    val n = 5000L
    val a = 1632456L; val b = 1000000L
    val m = KeyedMoments(1L, n, 2500L * (a + b), 2500L * (a * a + b * b))
    val mean = (a + b) / 2
    assert(!m.isOutlier(mean), "mean flagged as outlier — predicate overflowed")
    assert(m.isOutlier(2316228L), "clear outlier missed in the overflow regime")

    // Pin that this fixture actually exercises the overflow: the Long
    // spelling (the pre-fix implementation) disagrees on the mean.
    def longSpelling(vQ: Long): Boolean = {
      val d = m.n * vQ - m.s
      m.n >= 10 && d * d > 4 * (m.n * m.q - m.s * m.s)
    }
    assert(longSpelling(mean), "fixture not in the overflow regime — tighten the magnitudes")
  }
}
