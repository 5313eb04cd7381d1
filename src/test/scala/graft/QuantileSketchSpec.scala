package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{QSummary, QuantileSketch}

/** Compactor-sketch contract: bounded state, a self-carried rank-error
  * certificate that HOLDS against exact ranks under any partitioning /
  * merge tree, and streaming operation across micro-batches. The fixture
  * queries only exercise one partitioning; this spec sweeps several.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  /** Deterministically scrambled 1..n (value == rank, so exact ranks are
    * closed-form; hash scramble avoids presorted-input luck). */
  private def scrambled(n: Int): Seq[Double] =
    (1 to n).sortBy(i => Integer.reverse(i * 0x9e3779b9.toInt)).map(_.toDouble)

  private def summarize(data: Seq[Double], parts: Int, k: Int): QSummary = {
    val s = spark
    import s.implicits._
    s.createDataset(data)
      .repartition(parts)
      .select(udaf(new QuantileSketch(k), org.apache.spark.sql.Encoders.scalaDouble)(col("value")).as("s"))
      .select(col("s.*"))
      .as[QSummary]
      .head()
  }

  test("certificate holds vs exact ranks across partitionings; state stays small") {
    val n = 20000
    val data = scrambled(n)
    for (parts <- Seq(1, 3, 16)) {
      val sum = summarize(data, parts, k = 256)
      assert(sum.n === n.toLong)
      // state size: at most k items per level, ~log2(n/k) levels
      val maxItems = 256 * (64 - java.lang.Long.numberOfLeadingZeros(n.toLong / 256 + 1) + 2)
      assert(sum.values.size <= maxItems, s"summary blew up: ${sum.values.size} items")
      // certificate must be non-vacuous (10% gate used by the query)
      assert(sum.err * 10 <= sum.n, s"error bound too loose: ${sum.err} of ${sum.n}")
      for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
        val est = QSummary.estimate(sum.values, sum.weights, sum.n, q)
        val target = math.max(1L, math.ceil(q * n).toLong)
        // value==rank: exact rank interval of est is [est-1, est]
        val lo = est.toLong - 1 // count(x < est)
        val hi = est.toLong // count(x <= est)
        assert(hi >= target - sum.err && lo <= target + sum.err,
          s"q=$q parts=$parts: est=$est rank target=$target outside ±${sum.err}")
      }
    }
  }

  test("weights are powers of two and total weight equals n") {
    val sum = summarize(scrambled(5000), parts = 5, k = 64)
    assert(sum.weights.sum === sum.n)
    sum.weights.foreach(w => assert((w & (w - 1)) === 0L, s"non-power-of-two weight $w"))
    assert(sum.values === sum.values.sorted, "summary must be value-sorted")
  }

  test("duplicate-heavy input: estimate lands on the dominant value") {
    // median of a 70%-constant stream must be that constant
    val data = Seq.fill(7000)(42.0) ++ scrambled(3000).map(_ + 1e6)
    val sum = summarize(data, parts = 4, k = 128)
    val est = QSummary.estimate(sum.values, sum.weights, sum.n, 0.5)
    assert(est === 42.0, s"median of 70%-constant stream was $est")
  }

  test("sketch works as a STREAMING stateful aggregation across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Double]
    val q = stream
      .toDF()
      .select(udaf(new QuantileSketch(64), org.apache.spark.sql.Encoders.scalaDouble)(col("value")).as("s"))
      .writeStream
      .format("memory")
      .queryName("qsketch_stream_sink")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .start()
    val all = scrambled(6000)
    all.grouped(2000).foreach { batch => stream.addData(batch: _*); q.processAllAvailable() }
    val sum = s.table("qsketch_stream_sink").select(col("s.*")).as[QSummary].head()
    q.stop()
    assert(sum.n === 6000L, s"stream length lost across batches: ${sum.n}")
    val est = QSummary.estimate(sum.values, sum.weights, sum.n, 0.5)
    assert(math.abs(est - 3000.0) <= sum.err + 1,
      s"streaming median $est off by more than certificate ${sum.err}")
  }

  test("PROPERTY: certificate holds under random data and random merge trees") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // Pure-Scala check (no Spark): random values, random partition split,
    // random binary merge order — the exact degrees of freedom Spark's
    // scheduler owns. The certificate must survive all of them.
    val gen = for {
      n <- Gen.chooseNum(1, 4000)
      vals <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
      nParts <- Gen.chooseNum(1, 12)
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (vals, nParts, seed)
    val prop = Prop.forAll(gen) { case (vals, nParts, seed) =>
      val agg = new QuantileSketch(32)
      val rnd = new scala.util.Random(seed)
      val parts = vals.grouped(math.max(1, vals.size / nParts)).toVector
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
      // random merge tree: repeatedly merge two random partials
      var pool = rnd.shuffle(parts)
      while (pool.size > 1) {
        val i = rnd.nextInt(pool.size)
        val a = pool(i); pool = pool.patch(i, Nil, 1)
        val j = rnd.nextInt(pool.size)
        val b = pool(j); pool = pool.patch(j, Nil, 1)
        pool = pool :+ agg.merge(a, b)
      }
      val sum = agg.finish(pool.head)
      val sorted = vals.sorted
      sum.n == vals.size.toLong && sum.weights.sum == sum.n &&
      Seq(0.1, 0.5, 0.9).forall { q =>
        val est = QSummary.estimate(sum.values, sum.weights, sum.n, q)
        val target = math.max(1L, math.ceil(q * sum.n).toLong)
        val lo = sorted.count(_ < est).toLong
        val hi = sorted.count(_ <= est).toLong
        hi >= target - sum.err && lo <= target + sum.err
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("agg_quantile_sketch query: every quantile gated true") {
    val rows = SparkEntry
      .queries("agg_quantile_sketch")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 4)
    rows.foreach(r => assert(r.getBoolean(1), s"quantile ${r.getDouble(0)} failed its certificate"))
  }
}
