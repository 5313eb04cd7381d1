package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfIndex, IvfPq}

/** The materialized IVF-PQ layout: codes written partitioned by coarse
  * cluster id, searched through a planning-time partition filter. Pins
  * (1) searchIndexedPq ≡ in-memory searchPq on the same model+codes,
  * (2) the code scan PRUNES to the probed partitions, and (3) training
  * determinism across partitionings (the recall gate's precondition). */
class IvfPqLayoutSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def corpus() = Tables
    .embeddings(spark, sf)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

  test("PQ training is deterministic across partitionings") {
    val e = corpus()
    val coarse = IvfIndex.train(e, k = 10, iters = 3)
    val a1 = IvfIndex.assignAuto(e.repartition(1), coarse)
    val a7 = IvfIndex.assignAuto(e.repartition(7), coarse)
    val b1 = IvfPq.train(a1, coarse, m = 8, nCodes = 16).books
    val b7 = IvfPq.train(a7, coarse, m = 8, nCodes = 16).books
    assert(b1.keySet === b7.keySet)
    b1.foreach { case (cl, subs) =>
      subs.zip(b7(cl)).zipWithIndex.foreach { case ((s1, s7), sub) =>
        assert(s1.map(_.toSeq).toSeq === s7.map(_.toSeq).toSeq,
          s"codebook (cl=$cl, sub=$sub) changed under repartitioning")
      }
    }
  }

  test("train's group-sample cap: no-op at/under the cap, deterministic + bounded above it") {
    val e = corpus()
    val coarse = IvfIndex.train(e, k = 10, iters = 3)
    val assigned = IvfIndex.assignAuto(e, coarse)
    val maxGroup = assigned.groupBy("cl").count()
      .agg(max(col("count"))).collect()(0).getLong(0).toInt

    // a cap that admits every group trains BIT-IDENTICAL books to the
    // unbounded default — sampling only ever engages above the cap
    val tight = IvfPq.train(assigned, coarse, m = 8, nCodes = 16, maxGroupSample = maxGroup)
    val loose = IvfPq.train(assigned, coarse, m = 8, nCodes = 16)
    assert(tight.books.keySet === loose.books.keySet)
    tight.books.foreach { case (cl, subs) =>
      subs.zip(loose.books(cl)).foreach { case (s1, s2) =>
        assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq,
          s"cap == max group size changed the books for cl=$cl")
      }
    }

    // SKEW fixture: a duplicated centroid funnels EVERY vector into
    // cluster 0 (ties break low) — the hot-cluster shape that OOM'd the
    // unbounded spelling at scale. A cap far below the group size must
    // (a) stay deterministic across partitionings and (b) still search.
    val one = IvfIndex.Model(Array(coarse.centroids.head, coarse.centroids.head))
    val hotA = IvfIndex.assignAuto(e.repartition(1), one)
    val hotB = IvfIndex.assignAuto(e.repartition(7), one)
    assert(hotA.groupBy("cl").count().collect().map(_.getInt(0)).toSet == Set(0),
      "fixture failed: expected every vector in cluster 0")
    val capA = IvfPq.train(hotA, one, m = 8, nCodes = 16, maxGroupSample = 32)
    val capB = IvfPq.train(hotB, one, m = 8, nCodes = 16, maxGroupSample = 32)
    capA.books(0).zip(capB.books(0)).foreach { case (s1, s2) =>
      assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq,
        "capped training changed under repartitioning")
    }
    val probes = e.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val r = IvfPq.searchPq(e, IvfPq.encode(hotA, capA), probes, capA,
      nProbe = 1, topK = 5, shortlist = 25)
    assert(r.groupBy("q_id").count().collect().forall(_.getLong(1) === 5L),
      "search over sample-capped books lost candidates")
    // the cap must refuse to starve Lloyd of seeds
    intercept[IllegalArgumentException] {
      IvfPq.train(hotA, one, m = 8, nCodes = 16, maxGroupSample = 8)
    }
  }

  test("graft_adc_distance: native expression matches the manual sum; malformed inputs -> NULL") {
    val s = spark
    import s.implicits._
    graft.functions.GraftExtensions.register(spark)
    val table = Seq(Seq(1.0, 2.0, 4.0), Seq(8.0, 16.0, 32.0))
    val df = Seq(
      (Seq(0, 2), table, 33.0),  // 1 + 32
      (Seq(2, 1), table, 20.0),  // 4 + 16
      (Seq(1, 1), table, 18.0)   // 2 + 16
    ).toDF("codes", "tbl", "want")
    val got = df
      .withColumn("d", graft.functions.AdcDistance.column(col("codes"), col("tbl")))
      .collect()
    got.foreach(r => assert(r.getDouble(3) === r.getDouble(2), s"ADC mismatch: $r"))

    // subspace-count mismatch and out-of-range codes yield NULL, loudly
    // absent rather than silently wrong
    val bad = Seq(
      (Seq(0), table),       // m mismatch (1 code, 2 subspaces)
      (Seq(0, 9), table)     // code 9 out of range
    ).toDF("codes", "tbl")
      .withColumn("d", graft.functions.AdcDistance.column(col("codes"), col("tbl")))
      .collect()
    assert(bad.forall(_.isNullAt(2)), s"malformed ADC input did not yield NULL: ${bad.toSeq}")
  }

  test("empty coarse clusters (no codebook) are skipped, not crashed on") {
    val e = corpus()
    val coarse = IvfIndex.train(e, k = 8, iters = 3)
    // a duplicated centroid can never win an assignment (argmin ties
    // break on the LOWER cluster id), so cluster k is guaranteed empty:
    // it has a centroid in the model but no books entry after training
    val withEmpty = IvfIndex.Model(coarse.centroids :+ coarse.centroids.head)
    val assigned = IvfIndex.assignAuto(e, withEmpty)
    val pq = IvfPq.train(assigned, withEmpty, m = 8, nCodes = 16)
    assert(!pq.books.contains(withEmpty.k - 1), "fixture failed: duplicate centroid got members")
    val probes = e.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("v").as("qv"))
    // nProbe = k ranks EVERY probeable cluster — the empty one must be
    // excluded (pre-fix this crashed with NoSuchElementException)
    val r = IvfPq.searchPq(e, IvfPq.encode(assigned, pq), probes, pq,
      nProbe = withEmpty.k, topK = 5, shortlist = 25)
    assert(r.groupBy("q_id").count().collect().forall(_.getLong(1) === 5L))
  }

  test("encode re-homes vectors assigned to bookless clusters (append-after-train)") {
    val e = corpus()
    val coarse = IvfIndex.train(e, k = 8, iters = 3)
    val withEmpty = IvfIndex.Model(coarse.centroids :+ coarse.centroids.head)
    val assigned = IvfIndex.assignAuto(e, withEmpty)
    val pq = IvfPq.train(assigned, withEmpty, m = 8, nCodes = 16)
    val emptyCl = withEmpty.k - 1
    assert(!pq.books.contains(emptyCl), "fixture failed: duplicate centroid got members")
    // an appended vector lands in the bookless cluster (train-once,
    // encode-later): pre-fix this crashed with a bare
    // NoSuchElementException; now it re-homes to the nearest
    // book-bearing centroid and stays searchable
    val victim = assigned.filter(col("vec_id") === 0).withColumn("cl", lit(emptyCl))
    val enc = IvfPq.encode(victim, pq).collect()
    assert(enc.length === 1)
    val rehomed = enc.head.getInt(1)
    assert(rehomed !== emptyCl)
    assert(pq.books.contains(rehomed), s"re-homed to bookless cluster $rehomed")
    // nearest book-bearing centroid = the vector's plain coarse
    // assignment (its own cluster always has books — it was a member)
    val expected = IvfIndex.assignAuto(e.filter(col("vec_id") === 0), coarse)
      .select("cl").head().getInt(0)
    assert(rehomed === expected, "re-homing disagreed with the quantized-cosine argmax")
  }

  test("spilled composition: indexed ≡ in-memory, dedupe keeps exactly one row per pair") {
    val e = corpus()
    val coarse = IvfIndex.train(e, k = 10, iters = 3)
    val sp = IvfIndex.assignSpilled(e, coarse, spillMargin = 0.1)
    val pq = IvfPq.train(sp, coarse, m = 8, nCodes = 16)
    val path = "/root/repo/tmp/graft_io/ivfpq_spilled_spec"
    IvfPq.writeIndexedPq(sp, pq, path)
    val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val indexed = IvfPq.searchIndexedPq(path, e, probes, pq,
      nProbe = 4, topK = 5, shortlist = 25, spilled = true)
    val inMem = IvfPq.searchPq(e, IvfPq.encode(sp, pq), probes, pq,
      nProbe = 4, topK = 5, shortlist = 25, spilled = true)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "rnk", "vec_id").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(indexed) === rows(inMem))
    // no (q_id, vec_id) pair may appear twice — the spill dedupe claim
    val dups = indexed.groupBy("q_id", "vec_id").count().filter(col("count") > 1).count()
    assert(dups === 0L, "a spilled vector surfaced twice in one query's ranking")
  }

  test("PQ model round-trips bit-exactly through savePqModel/loadPqModel (search parity)") {
    val e = corpus()
    val coarse = IvfIndex.train(e, k = 10, iters = 3)
    val assigned = IvfIndex.assignAuto(e, coarse)
    val pq = IvfPq.train(assigned, coarse, m = 8, nCodes = 16)
    val path = "/root/repo/tmp/graft_io/ivfpq_model_spec"
    IvfPq.savePqModel(spark, pq, path)
    val loaded = IvfPq.loadPqModel(spark, path, coarse)
    assert(loaded.m === pq.m && loaded.nCodes === pq.nCodes)
    assert(loaded.books.keySet === pq.books.keySet)
    pq.books.foreach { case (cl, subs) =>
      subs.zip(loaded.books(cl)).foreach { case (s1, s2) =>
        assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq,
          s"codebook cl=$cl changed across the parquet round trip")
      }
    }
    val probes = e.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("v").as("qv"))
    def rows(m: IvfPq.PqModel) = IvfPq
      .searchPq(e, IvfPq.encode(assigned, m), probes, m, nProbe = 3, topK = 5, shortlist = 25)
      .select("q_id", "rnk", "vec_id").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(loaded) === rows(pq), "loaded model ranked differently")
    // a missing artifact is refused loudly, never an empty model
    val ex = intercept[Exception] {
      IvfPq.loadPqModel(spark, "/root/repo/tmp/graft_io/ivfpq_model_spec_missing", coarse)
    }
    assert(ex.getMessage != null)
  }

  test("frozen-books streaming append: parity with a batch re-encode of the union") {
    val s = spark
    import s.implicits._
    def tmp(n: String) = {
      val p = java.nio.file.Files.createTempDirectory(s"graft_$n"); p.toFile.deleteOnExit(); p.toString
    }
    val basePath = tmp("pq_base"); val deltaPath = tmp("pq_delta")
    val ckpt = tmp("pq_ckpt"); val unionPath = tmp("pq_union")
    val all = corpus().localCheckpoint()
    val base = all.filter(col("vec_id") < 400)
    val appended = all.filter(col("vec_id") >= 400)
    val coarse = IvfIndex.train(base, k = 8, iters = 3)
    val pq = IvfPq.train(IvfIndex.assignAuto(base, coarse), coarse, m = 8, nCodes = 16)
    IvfPq.writeIndexedPq(IvfIndex.assignAuto(base, coarse), pq, basePath)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val stream = ms.toDF().toDF("vec_id", "v")
    val newRows = appended.select(col("vec_id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def drain(): Unit = {
      val q = IvfPq.appendEncodedSink(stream, pq, deltaPath, ckpt)
      q.processAllAvailable(); q.stop()
    }
    ms.addData(newRows.take(newRows.length / 2).toSeq); drain()
    ms.addData(newRows.drop(newRows.length / 2).toSeq); drain()
    assert(spark.read.parquet(deltaPath).count() === newRows.length.toLong)

    // parity: identical ranking vs a batch-written index over the union
    // with the SAME frozen model and books
    IvfPq.writeIndexedPq(IvfIndex.assignAuto(all, coarse), pq, unionPath)
    val probes = all.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("v").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "rnk", "vec_id").orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaDelta = rows(IvfPq.searchIndexedPqWithDelta(
      basePath, deltaPath, all, probes, pq, nProbe = 3, topK = 5, shortlist = 25))
    val viaBatch = rows(IvfPq.searchIndexedPq(
      unionPath, all, probes, pq, nProbe = 3, topK = 5, shortlist = 25))
    assert(viaDelta === viaBatch, "maintained code index ranked differently from batch rebuild")

    // exactly-once: checkpoint replay with no new data adds nothing
    drain()
    assert(spark.read.parquet(deltaPath).count() === newRows.length.toLong,
      "replay duplicated delta code rows")
  }

  test("drift trigger: stationary appends stay under the bound, shifted trip it, serving refuses") {
    val s = spark
    import s.implicits._
    def tmp(n: String) = {
      val p = java.nio.file.Files.createTempDirectory(s"graft_$n"); p.toFile.deleteOnExit(); p.toString
    }
    val basePath = tmp("pqd_base"); val deltaPath = tmp("pqd_delta"); val ckpt = tmp("pqd_ckpt")
    val all = corpus().localCheckpoint()
    val base = all.filter(col("vec_id") < 400)
    val heldOut = all.filter(col("vec_id") >= 400)
    val coarse = IvfIndex.train(base, k = 8, iters = 3)
    val pq = IvfPq.train(IvfIndex.assignAuto(base, coarse), coarse, m = 8, nCodes = 16)
    IvfPq.writeIndexedPq(IvfIndex.assignAuto(base, coarse), pq, basePath)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(basePath, "_graft_drift_base")),
      "writeIndexedPq did not persist the training drift statistic")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val stream = ms.toDF().toDF("vec_id", "v")
    def drain(): Unit = {
      val q = IvfPq.appendEncodedSink(stream, pq, deltaPath, ckpt)
      q.processAllAvailable(); q.stop()
    }
    val heldRows = heldOut.select(col("vec_id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))

    // STATIONARY appends: held-out inertia sits a little above 1.0 and
    // stays under the bound — volume alone never forces a retrain
    ms.addData(heldRows.toSeq); drain()
    val repS = IvfPq.driftReport(spark, basePath, deltaPath)
    assert(!repS.flagged && repS.ratio < 1.5 && repS.ratio > 0.5,
      s"stationary appends tripped the drift bound: $repS")
    val probes = all.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("v").as("qv"))
    assert(IvfPq.searchIndexedPqWithDelta(
      basePath, deltaPath, all, probes, pq, nProbe = 3, topK = 5, shortlist = 25,
      driftBound = Some(1.5)).count() > 0,
      "serving refused under-bound stationary appends")

    // SHIFTED appends (+1.5/dim): the frozen books' residuals explode —
    // the L2 statistic jumps orders of magnitude and the bound trips
    ms.addData(heldRows.map { case (id, v) => (id + 1000000L, v.map(_ + 1.5)) }.toSeq); drain()
    val repD = IvfPq.driftReport(spark, basePath, deltaPath)
    assert(repD.flagged && repD.ratio > 1.5, s"shifted appends did not trip the bound: $repD")
    val shiftedAll = all.unionByName(
      all.select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"), x => x + lit(1.5)).as("v")))
    val ex = intercept[IllegalArgumentException] {
      IvfPq.searchIndexedPqWithDelta(
        basePath, deltaPath, shiftedAll, probes, pq, nProbe = 3, topK = 5, shortlist = 25,
        driftBound = Some(1.5))
    }
    assert(ex.getMessage.contains("retrain"), ex.getMessage)
    // without the bound the operator can still serve (informed choice)
    assert(IvfPq.searchIndexedPqWithDelta(
      basePath, deltaPath, shiftedAll, probes, pq, nProbe = 3, topK = 5,
      shortlist = 25).count() > 0)

    // a base predating drift tracking refuses with rebuild guidance
    val exNoStat = intercept[IllegalArgumentException] {
      IvfPq.driftReport(spark, deltaPath, deltaPath)
    }
    assert(exNoStat.getMessage.contains("predates drift tracking"), exNoStat.getMessage)
  }

  test("indexed PQ search ≡ in-memory searchPq, and the code scan prunes partitions") {
    val e = corpus()
    val coarse = IvfIndex.train(e, k = 10, iters = 3)
    val assigned = IvfIndex.assignAuto(e, coarse)
    val pq = IvfPq.train(assigned, coarse, m = 8, nCodes = 16)
    val path = "/root/repo/tmp/graft_io/ivfpq_index_spec"
    IvfPq.writeIndexedPq(assigned, pq, path)
    val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"))

    val indexed = IvfPq.searchIndexedPq(path, e, probes, pq, nProbe = 3, topK = 5, shortlist = 25)
    val inMem = IvfPq.searchPq(
      e, IvfPq.encode(assigned, pq), probes, pq, nProbe = 3, topK = 5, shortlist = 25)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "rnk", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(key(indexed) === key(inMem))

    def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
        pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val here = p.collect(pf)
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case q: QueryStageExec        => q.plan
      }
      here ++ nested.flatMap(collectAll(_)(pf))
    }
    val scans = collectAll(indexed.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("ivfpq_index_spec")) => s
    }
    assert(scans.nonEmpty, "no parquet scan found for the code-index read")
    val s = scans.head
    assert(s.partitionFilters.nonEmpty, "code scan has no planning-time partition filter")
    val selected = s.selectedPartitions.partitionCount
    val populated = new java.io.File(path).listFiles().count(_.getName.startsWith("cl="))
    assert(selected < populated || populated <= 3,
      s"scan read all $populated partitions — no pruning (selected=$selected)")
  }
}
