package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the quality contract of the approximate similarity path:
  * sim_ann_ivf (IVF, nProbe=3 of 10 clusters) must recover most of the
  * exact brute-force top-5 (sim_topk_cosine). Everything is
  * deterministic (fixed fixtures, seeded quantized arithmetic), so the
  * observed recall is stable — the assertion uses a safety margin below
  * the measured value rather than the exact number.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** The fixture embeddings are near-uniform random — the worst case for
    * ANY partition-based ANN (expected recall ≈ the scanned fraction,
    * nProbe/k) — so the spec pins what the implementation owns, using
    * the engine's OWN trained codebook (no reimplementation of k-means):
    * given the trained centroids, the search result must be the EXACT
    * top-5 within the 3 nearest-centroid clusters, reproduced by an
    * independent driver-side evaluation over the collected fixture
    * (500×64, test-only).
    */
  test("IVF ANN returns the exact top-5 within the 3 nearest-centroid clusters") {
    import org.apache.spark.sql.functions.col
    val e = Tables
      .embeddings(spark, sf)
      .select(
        col("vec_id"),
        org.apache.spark.sql.functions
          .transform(col("embedding"), x => x.cast("double"))
          .as("v")
      )
    val model = operators.IvfIndex.train(e, k = 10, iters = 3)
    assert(model.k === 10)

    def qdot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => math.floor(x * y * 1e6 + 0.5) }.sum / 1e6
    def cos(a: Array[Double], b: Array[Double]): Double =
      qdot(a, b) / math.sqrt(qdot(a, a) * qdot(b, b))

    val rows = e
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cents = model.centroids.map(_.toArray)
    // driver-side re-evaluation of assignment (same argmin + tie rule)
    val assign = rows.map { case (id, v) =>
      id -> cents.zipWithIndex.map { case (c, i) => (-cos(v, c), i) }.min._2
    }.toMap
    val expected = rows.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val probed = cents.zipWithIndex
        .map { case (c, i) => (-cos(qv, c), i) }
        .sorted
        .take(3)
        .map(_._2)
        .toSet
      rows
        .filter { case (id, _) => id != qid && probed.contains(assign(id)) }
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(5)
        .zipWithIndex
        .map { case ((id, _), i) => (qid, (i + 1).toLong, id) }
    }.toSet

    val probes = e
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val got = operators.IvfIndex
      .search(e, probes, model, nProbe = 3, topK = 5)
      .select("q_id", "rnk", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === expected)
  }

  test("sim_ann_ivf declares its recall bound: one row, recall_ok TRUE") {
    val out = SparkEntry.queries("sim_ann_ivf")(spark, sf).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 5L)
    assert(out(0).getBoolean(1), "mean recall@5 fell below the declared 0.3 bound")
  }

  test("autoParams: k ≈ √N capped at 256, nProbe keeps the scanned fraction constant") {
    assert(operators.IvfIndex.autoParams(500L) === ((22, 7)))
    assert(operators.IvfIndex.autoParams(2000L) === ((45, 14)))
    assert(operators.IvfIndex.autoParams(1L) === ((4, 2)))
    val (kBig, npBig) = operators.IvfIndex.autoParams(100000000L)
    assert(kBig === 256 && npBig === 77)
    // scanned fraction nProbe/k stays ~targetScanFrac across scales
    for (n <- Seq(1000L, 10000L, 1000000L)) {
      val (k, np) = operators.IvfIndex.autoParams(n)
      val frac = np.toDouble / k
      assert(frac >= 0.3 && frac <= 0.4, s"n=$n scanned fraction $frac drifted")
    }
  }

  test("train caps the sample by rows: tightened threshold yields a nested subset") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val e = (0L until 2000L).map(i => (i, Seq.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "v")
    // cap far below the 40% sample (~800 rows): training must still
    // converge on a codebook and touch ≤ maxSampleRows rows
    val m = operators.IvfIndex.train(e, k = 4, iters = 2, samplePct = 40, maxSampleRows = 100L)
    assert(m.k === 4)
    // the refined threshold keeps a deterministic SUBSET of the coarse
    // sample, proportionally near the cap (hash uniformity gives ± slack)
    val lat = 1000000L
    val h = pmod(xxhash64(col("vec_id"), lit(42)), lit(lat))
    val coarse = e.filter(h < lit(40L * (lat / 100)))
    val nCoarse = coarse.count()
    val thresh = math.max(1L, 40L * (lat / 100) * 100L / nCoarse)
    val refined = e.filter(h < lit(thresh))
    val nRefined = refined.count()
    assert(nRefined <= 130L && nRefined >= 50L, s"refined sample $nRefined far from cap 100")
    assert(refined.join(coarse, Seq("vec_id"), "left_anti").count() === 0L, "refined ⊄ coarse")
  }

  /** The LSH-banded embedding near-dup must equal the exact all-pairs
    * result on the fixture (zero false negatives at the 0.4 threshold —
    * the same contract the driver's DuckDB oracle enforces). */
  test("embed near-dup LSH(4,64) ≡ exact all-pairs at threshold 0.4") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftExtensions.register(spark)
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val lsh = operators.Similarity
      .embedNearDupLsh(e, threshold = 0.4, bitsPerBand = 4, bands = 64)
      .select("v1", "v2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val exact = e
      .as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("v1"),
        col("b.vec_id").as("v2"),
        graft.functions.CosineSimilarity.column(col("a.v"), col("b.v")).as("cos")
      )
      .filter(col("cos") >= 0.4)
      .select("v1", "v2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(lsh === exact, s"missing=${exact -- lsh} extra=${lsh -- exact}")
    assert(exact.nonEmpty, "fixture has constructed embedding near-duplicates; exact found none")
  }

  /** On a corpus with REAL duplicate structure (near-identical vectors at
    * cos ≥ 0.99, the production dedup regime) the same operator prunes
    * hard: r=10 bits × 25 bands finds every true pair while keeping under
    * 10% of all pairs as candidates. This is the scale contract — the
    * fixture's 0.4-threshold regime (no gap in the cosine continuum)
    * cannot prune by geometry, structured corpora do. */
  test("embed near-dup LSH(10,25) prunes structured corpora: zero FN, <10% candidates") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(77)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // 200 unrelated vectors + 20 near-identical pairs (tiny perturbation)
    val base = (0 until 200).map(i => (i.toLong, unit().toSeq))
    val dups = (0 until 20).flatMap { i =>
      val b = base(i)._2.toArray
      val noisy = b.map(_ + 0.02 * rnd.nextGaussian())
      val n = math.sqrt(noisy.map(x => x * x).sum)
      Seq((1000L + i, noisy.map(_ / n).toSeq))
    }
    val e = (base ++ dups).toDF("vec_id", "v")
    val nTotal = base.size + dups.size
    val allPairs = nTotal.toLong * (nTotal - 1) / 2

    val cands = operators.Similarity.lshCandidates(e, bitsPerBand = 10, bands = 25)
    val nCands = cands.count()
    assert(nCands < allPairs / 10, s"LSH kept $nCands of $allPairs pairs — no pruning")

    val found = operators.Similarity
      .embedNearDupLsh(e, threshold = 0.9, bitsPerBand = 10, bands = 25)
      .select("v1", "v2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val expected = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
    assert(expected.subsetOf(found), s"missed true near-dups: ${expected -- found}")
  }

  test("lshAutoParams: S-curve capture ≥ target at the threshold, bands within cap") {
    def capture(t: Double, r: Int, b: Int): Double = {
      val p = 1.0 - math.acos(t) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, r), b)
    }
    assert(operators.Similarity.lshAutoParams(0.9) === ((14, 57)))
    for (t <- Seq(0.5, 0.7, 0.8, 0.9, 0.95, 0.99)) {
      val (r, b) = operators.Similarity.lshAutoParams(t)
      assert(b <= 64, s"t=$t bands $b exceed cap")
      assert(capture(t, r, b) >= 0.999, s"t=$t ($r,$b) capture ${capture(t, r, b)} < target")
      // background rejection is only physical in the high-threshold
      // regime (the scaladoc's contract — at low thresholds no band
      // scheme separates a 0.35 cosine gap): check it where it holds
      if (t >= 0.9) {
        val bg = capture(math.max(0.05, t - 0.35), r, b)
        assert(bg < 0.5, s"t=$t ($r,$b) background capture $bg — no rejection")
      }
    }
  }

  test("lshCandidatesIncr: old-only plus restricted pairs tile the full candidate set") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(91)
    def unit(): Seq[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val e = (0 until 300).map(i => (i.toLong, unit())).toDF("vec_id", "v")
    val isNew = pmod(col("vec_id"), lit(5)) === 0
    def pairSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairSet(operators.Similarity.lshCandidates(e, 4, 16))
    val oldOnly = pairSet(operators.Similarity.lshCandidates(e.filter(!isNew), 4, 16))
    val incr = pairSet(operators.Similarity.lshCandidatesIncr(e, isNew, 4, 16))
    // restricted pairs are exactly the full set minus the old-old ones —
    // no pair is lost and none is double-generated
    assert(incr.forall { case (a, b) => a % 5 == 0 || b % 5 == 0 },
      "incr emitted a pair with no new endpoint")
    assert((oldOnly ++ incr) === full, "old ∪ incr does not tile the full candidate set")
    assert(oldOnly.intersect(incr).isEmpty, "old and incr overlap")
  }

  test("lshAutoParamsScaled: background candidates bounded per row, recall held, bits grow with n") {
    def capture(t: Double, r: Int, b: Int): Double = {
      val p = 1.0 - math.acos(t) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, r), b)
    }
    var lastR = 0
    for (n <- Seq(1000L, 10000L, 100000L, 1000000L, 100000000L, 1000000000L)) {
      val (r, b) = operators.Similarity.lshAutoParamsScaled(n, 0.9)
      // declared contract: expected background candidates per row under budget
      assert((n / 2.0) * b * math.pow(0.5, r) <= 10.0,
        s"n=$n ($r,$b): background per-row bound violated")
      // recall at the threshold unchanged by the scaling dimension
      assert(capture(0.9, r, b) >= 0.999, s"n=$n ($r,$b): recall lost")
      // monotone: a bigger corpus never gets FEWER bits
      assert(r >= lastR, s"n=$n: bits regressed $lastR -> $r")
      // keys must still pack into one long
      assert(r <= 48, s"n=$n: $r bits exceed the single-long key packing")
      lastR = r
    }
    // 100 TB sanity (10^10 rows): recall 0.999 forces a heavy signature
    // (bands grow (1/p)^r while each bit only halves background), so the
    // honest huge-n operating point trades a little recall; at 0.99 the
    // bound, the recall, and the packing limit all still hold.
    val (r10, b10) = operators.Similarity
      .lshAutoParamsScaled(10000000000L, 0.9, targetRecall = 0.99)
    assert((10000000000L / 2.0) * b10 * math.pow(0.5, r10) <= 10.0)
    assert(capture(0.9, r10, b10) >= 0.99)
    assert(r10 <= 48 && b10 <= 4096, s"10^10 rows -> ($r10,$b10) not implementable")
  }

  test("auto-derived params prune a structured corpus with zero false negatives") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(77)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val base = (0 until 200).map(i => (i.toLong, unit().toSeq))
    val dups = (0 until 20).flatMap { i =>
      val b = base(i)._2.toArray
      val noisy = b.map(_ + 0.02 * rnd.nextGaussian())
      val n = math.sqrt(noisy.map(x => x * x).sum)
      Seq((1000L + i, noisy.map(_ / n).toSeq))
    }
    val e = (base ++ dups).toDF("vec_id", "v")
    val (r, b) = operators.Similarity.lshAutoParams(0.9)
    val nTotal = base.size + dups.size
    val allPairs = nTotal.toLong * (nTotal - 1) / 2
    val nCands = operators.Similarity.lshCandidates(e, bitsPerBand = r, bands = b).count()
    assert(nCands < allPairs / 10, s"auto params kept $nCands of $allPairs pairs — no pruning")
    val found = operators.Similarity
      .embedNearDupLsh(e, threshold = 0.9, bitsPerBand = r, bands = b)
      .select("v1", "v2")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .toSet
    val expected = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
    assert(expected.subsetOf(found), s"auto params missed true near-dups: ${expected -- found}")
  }

  test("lshSearch: planted near-identical vector found at rank 1; ranking is exact cosine") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val base = (0 until 300).map(i => (i.toLong, unit().toSeq))
    // vec 900 ≈ vec 0 (cos ≈ 0.999): every band collides with
    // probability ~0.94^16 ≈ 1 − 1e−20 — it MUST surface at rank 1
    val twin = {
      val b = base(0)._2.toArray
      val noisy = b.map(_ + 0.005 * rnd.nextGaussian())
      val n = math.sqrt(noisy.map(x => x * x).sum)
      (900L, noisy.map(_ / n).toSeq)
    }
    val corpus = (base :+ twin).toDF("vec_id", "v")
    val probes = corpus.filter(col("vec_id") === 0L).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val got = operators.Similarity
      .lshSearch(corpus, probes, bitsPerBand = 6, bands = 16, topK = 5)
      .orderBy(col("rnk"))
      .collect()
    assert(got.nonEmpty)
    assert(got.head.getLong(2) === 900L, s"twin not at rank 1: ${got.toSeq}")
    assert(got.head.getLong(0) === 0L)
    // self excluded, ranks contiguous from 1, cosines non-increasing
    assert(!got.exists(_.getLong(2) == 0L), "self-match not excluded")
    assert(got.map(_.getLong(1)).toSeq === (1L to got.length))
    val cosines = got.map(_.getDouble(3)).toSeq
    assert(cosines === cosines.sorted.reverse, s"ranking not by cosine: $cosines")
  }

  test("graft_cosine_topk TVF ≡ Scala cosineTopK (same plan, same rows)") {
    import org.apache.spark.sql.functions.col
    graft.functions.GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("sim_tvf_emb")
    val viaSql = spark
      .sql("SELECT q_id, rnk, vec_id, cos FROM graft_cosine_topk('sim_tvf_emb', 'vec_id', 'embedding', 3, 4)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = e.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val viaScala = operators.Similarity
      .cosineTopK(e, probes, 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(viaSql === viaScala)
    assert(viaSql.size === 3 * 4, s"expected 3 probes × top-4, got ${viaSql.size}")
  }

  test("near-dup operators agree: minhash(0.6) ⊇ simhash(0.9) pairs") {
    def pairs(name: String) = SparkEntry
      .queries(name)(spark, sf)
      .select("d1", "d2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val mh = pairs("dedup_minhash_lsh")
    val sh = pairs("dedup_simhash")
    assert(sh.subsetOf(mh), s"simhash pairs not within minhash pairs: ${sh -- mh}")
    assert(mh.nonEmpty, "fixture has constructed near-duplicates; minhash found none")
  }

  test("rrfFuse: n-leg fusion with missing ids, integer-exact contributions") {
    import spark.implicits._
    // three legs over ids 1..4; id 4 appears in one leg only, id 1 in all
    def leg(rows: (Long, Long)*) = rows.toSeq.toDF("id", "rank")
    val fused = graft.operators.Similarity
      .rrfFuse(
        Seq(
          "a" -> leg(1L -> 1L, 2L -> 2L, 3L -> 3L),
          "b" -> leg(1L -> 2L, 3L -> 1L),
          "c" -> leg(1L -> 3L, 4L -> 1L)),
        rrfK = 60)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[java.lang.Long]("a_rank")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("b_rank")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("c_rank")).map(_.toLong),
          r.getAs[Long]("rrf_score"))))
      .toMap
    def c(rank: Long) = 1000000000L / (60L + rank) // JVM integer division ≡ the div contract
    assert(fused(1L) === ((Some(1L), Some(2L), Some(3L), c(1) + c(2) + c(3))))
    assert(fused(2L) === ((Some(2L), None, None, c(2))))
    assert(fused(3L) === ((Some(3L), Some(1L), None, c(3) + c(1))))
    assert(fused(4L) === ((None, None, Some(1L), c(1))))
    // all-leg presence dominates: id 1 outranks every partial-presence id
    assert(fused(1L)._4 > fused(3L)._4 && fused(3L)._4 > fused(2L)._4)
  }
}
