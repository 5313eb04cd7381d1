package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FreqItems

/** Misra-Gries sketch contract: bounded state, undercount-only
  * estimates within n/(c+1), zero false negatives above the threshold —
  * on a SKEWED stream across multiple partitions (the merge path), which
  * the near-uniform fixture cannot exercise.
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  /** Zipf-ish stream: value v_i appears ~N/i times — a realistic
    * heavy-hitter profile with a long uniform-ish tail. */
  private def zipfStream: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"v$i"))

  test("sketch state stays bounded, estimates undercount within n/(c+1)") {
    val s = spark
    import s.implicits._
    val c = 8
    val data = zipfStream
    val trueCounts = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = data.size.toLong
    // 7 partitions exercises reduce AND multi-way merge
    val sk = s
      .createDataset(data)
      .repartition(7)
      .select(udaf(new FreqItems(c), org.apache.spark.sql.Encoders.STRING)(col("value")).as("m"))
      .as[Map[String, Long]]
      .head()
    assert(sk.size <= c, s"state exceeded $c counters: ${sk.size}")
    val bound = n / (c + 1)
    sk.foreach { case (k, est) =>
      val t = trueCounts(k)
      assert(est <= t, s"$k overcounted: est $est > true $t")
      assert(t - est <= bound, s"$k undercount ${t - est} exceeds bound $bound")
    }
    // zero false negatives above the threshold
    val mustFind = trueCounts.collect { case (k, t) if t > bound => k }.toSet
    assert(mustFind.nonEmpty, "fixture produced no heavy hitters — test is vacuous")
    val missed = mustFind -- sk.keySet
    assert(missed.isEmpty, s"heavy hitters missing from sketch: $missed")
  }

  test("c=1 degenerates to the majority-candidate (Boyer-Moore) guarantee") {
    val s = spark
    import s.implicits._
    // strict majority element across partitions
    val data = Seq.fill(600)("maj") ++ (1 to 400).map(i => s"x$i")
    val sk = s
      .createDataset(new scala.util.Random(11).shuffle(data))
      .repartition(5)
      .select(udaf(new FreqItems(1), org.apache.spark.sql.Encoders.STRING)(col("value")).as("m"))
      .as[Map[String, Long]]
      .head()
    assert(sk.keySet === Set("maj"), s"majority element not the surviving counter: $sk")
  }

  test("sketch works as a STREAMING stateful aggregation across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val c = 4
    val q = stream
      .toDF()
      .select(udaf(new FreqItems(c), org.apache.spark.sql.Encoders.STRING)(col("value")).as("m"))
      .writeStream
      .format("memory")
      .queryName("freq_stream_sink")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .start()
    // three micro-batches: the MG buffer must carry across batches via
    // the streaming state store (reduce within batch, merge on restore)
    stream.addData(Seq.fill(50)("hot") ++ (1 to 30).map(i => s"a$i"): _*)
    q.processAllAvailable()
    stream.addData(Seq.fill(40)("hot") ++ (1 to 30).map(i => s"b$i"): _*)
    q.processAllAvailable()
    stream.addData(Seq.fill(30)("hot") ++ (1 to 30).map(i => s"c$i"): _*)
    q.processAllAvailable()
    val sk = s.table("freq_stream_sink").as[Map[String, Long]].head()
    q.stop()
    val n = 50 + 40 + 30 + 90L
    assert(sk.size <= c, s"streaming state exceeded $c counters: $sk")
    // hot: true 120 > n/(c+1) = 42 → guaranteed present, undercount-only
    assert(sk.contains("hot"), s"cross-batch heavy hitter lost: $sk")
    assert(sk("hot") <= 120L && 120L - sk("hot") <= n / (c + 1), s"estimate out of bounds: ${sk("hot")}")
  }

  test("per-key streaming heavy hitters: isolated bounded state per key, Update mode") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val c = 4
    val q = graft.streaming.StreamingSketch
      .heavyHittersByKey(stream.toDS(), c)
      .writeStream
      .format("memory")
      .queryName("keyed_freq_sink")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .start()
    // key A: stable heavy hitter; key B: pure flood of distinct values —
    // B's churn must not touch A's counters (state-store isolation)
    stream.addData(Seq.fill(60)(("A", "hot")) ++ (1 to 30).map(i => ("A", s"a$i")): _*)
    q.processAllAvailable()
    stream.addData((1 to 200).map(i => ("B", s"flood$i")) ++ Seq.fill(40)(("A", "hot")): _*)
    q.processAllAvailable()
    val rows = s
      .table("keyed_freq_sink")
      .as[graft.streaming.KeyedFreqSketch]
      .collect()
    q.stop()
    // Update mode emits one row per key per batch it changed in; the
    // LAST row per key is the live state
    val latest = rows.groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.n) }
    val a = latest("A")
    assert(a.n === 130L, s"key A stream length wrong: ${a.n}")
    assert(a.counters.size <= c && a.counters.contains("hot"),
      s"key A lost its heavy hitter to key B's flood: ${a.counters}")
    assert(a.counters("hot") <= 100L && 100L - a.counters("hot") <= a.n / (c + 1))
    val b = latest("B")
    assert(b.n === 200L && b.counters.size <= c,
      s"key B state not bounded: n=${b.n} size=${b.counters.size}")
  }

  test("agg_heavy_hitters query: dominant language found, exact heavy count") {
    val row = SparkEntry
      .queries("agg_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .head()
    assert(row.getLong(0) >= 1L, "fixture should have at least one >1/3 language")
    assert(row.getBoolean(1), "guaranteed heavy hitter missing from sketch")
  }
}
