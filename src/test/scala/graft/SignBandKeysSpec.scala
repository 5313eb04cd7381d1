package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SignBandKeys

/** The native sign-LSH signature expression: interpreted eval and
  * whole-stage-codegen eval must agree bit-for-bit (the LSH zero-FN
  * contract depends on the signature being a pure function of the data,
  * whichever execution path Spark picks), and both must match an
  * independent driver-side reimplementation over the same seeded plane
  * family.
  */
class SignBandKeysSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val Bits = 4
  private val Bands = 16

  private def fixture(n: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(31337)
    (0 until n).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
  }

  private def driverSideKeys(v: Seq[Double]): Seq[Long] = {
    val planes = SignBandKeys.planes(SignBandKeys.DefaultSeed, Bits * Bands)
    (0 until Bands).map { b =>
      (0 until Bits).foldLeft(0L) { (key, i) =>
        val p = planes(b * Bits + i)
        val dot = v.zip(p).map { case (x, y) => x * y }.sum
        if (dot > 0) key | (1L << i) else key
      }
    }
  }

  test("codegen path ≡ interpreted path ≡ driver-side reimplementation") {
    val s = spark
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val rows = fixture(200)
    val df = rows.toDF("id", "v")

    def collectKeys(session: SparkSession, codegen: Boolean): Map[Long, Seq[Long]] = {
      val s2 = session.newSession()
      graft.functions.GraftExtensions.register(s2)
      s2.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      if (!codegen) s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      import s2.implicits._
      rows
        .toDF("id", "v")
        .select(col("id"),
          SignBandKeys.keysColumn(col("v"), Bits, Bands, SignBandKeys.DefaultSeed).as("ks"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1))
        .toMap
    }

    val gen = collectKeys(s, codegen = true)
    val interp = collectKeys(s, codegen = false)
    assert(gen === interp, "codegen and interpreted signatures diverge")
    rows.foreach { case (id, v) =>
      assert(gen(id) === driverSideKeys(v), s"vector $id: engine signature != reimplementation")
    }
  }

  test("multi-probe keys: slot 0 is the base key, probes flip the lowest-margin bits") {
    val s = spark
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val rows = fixture(50)
    val T = 2
    val got = rows
      .toDF("id", "v")
      .select(col("id"),
        graft.functions.SignBandProbes
          .keysColumn(col("v"), Bits, Bands, SignBandKeys.DefaultSeed, T).as("ks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toMap
    val planes = SignBandKeys.planes(SignBandKeys.DefaultSeed, Bits * Bands)
    rows.foreach { case (id, v) =>
      val ks = got(id)
      assert(ks.size === Bands * (1 + T))
      val baseKeys = driverSideKeys(v)
      (0 until Bands).foreach { b =>
        val slot = ks.slice(b * (1 + T), (b + 1) * (1 + T))
        assert(slot.head === baseKeys(b), s"vector $id band $b: slot 0 is not the base key")
        // expected flip order: bits sorted by |v·h| ascending
        val margins = (0 until Bits).map { i =>
          math.abs(v.zip(planes(b * Bits + i)).map { case (x, y) => x * y }.sum)
        }
        val order = (0 until Bits).sortBy(margins)
        (0 until T).foreach { t =>
          assert(slot(1 + t) === (baseKeys(b) ^ (1L << order(t))),
            s"vector $id band $b probe $t: wrong bit flipped")
        }
      }
    }
  }

  test("multi-probe search candidates are a superset of single-probe's") {
    val s = spark
    import s.implicits._
    val corpus = fixture(300).toDF("vec_id", "v")
    val probes = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def cands(t: Int): Set[(Long, Long)] = operators.Similarity
      .lshSearch(corpus, probes, bitsPerBand = 6, bands = 8, topK = 1000, extraProbes = t)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = cands(0)
    val multi = cands(2)
    assert(single.subsetOf(multi),
      "multi-probe must only ADD candidate buckets (base keys are probed unchanged)")
    assert(multi.size > single.size,
      "multi-probe probed no extra bucket on 300 random vectors — flips are not reaching the join")
  }

  test("null vector yields null signature; signature length = bands") {
    val s = spark
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val df = Seq((1L, Some(Seq.fill(64)(0.5))), (2L, Option.empty[Seq[Double]]))
      .toDF("id", "v")
      .select(col("id"), SignBandKeys.keysColumn(col("v"), Bits, Bands, 9001L).as("ks"))
    val out = df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(2L).isEmpty, "null vector must produce null signature")
    assert(out(1L).get.asInstanceOf[scala.collection.Seq[Long]].size === Bands)
  }
}
