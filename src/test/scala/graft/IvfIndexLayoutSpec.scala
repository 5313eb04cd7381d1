package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IvfIndex

/** The materialized IVF layout: corpus written partitioned by cluster id,
  * probes read back through a planning-time partition filter. Pins the
  * two properties that make IVF an index rather than a scan:
  * (1) searchIndexed ≡ in-memory search on the same corpus+model, and
  * (2) the parquet scan PRUNES to the probed partitions (nProbe dirs of
  * k — at 100 TB, the difference between reading 30% and 100% of the
  * table).
  */
class IvfIndexLayoutSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("broadcast assignment ≡ fused-literal assignment, on a trained and an oversized model") {
    val base = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val dim = base.select(size(col("v"))).first().getInt(0)

    // Degenerate inputs pin the broadcast path's hand-replicated
    // null-first struct ordering: null vector, null element, zero norm,
    // and dim mismatch must each resolve to the FIRST null-distance
    // centroid on both paths (= cluster 0 when every centroid is sound).
    val degenerates = spark.sql(
      s"""SELECT * FROM VALUES
         |  (900001L, CAST(NULL AS ARRAY<DOUBLE>)),
         |  (900002L, array(CAST(NULL AS DOUBLE), ${Seq.fill(dim - 1)("0.5").mkString(",")})),
         |  (900003L, array(${Seq.fill(dim)("0.0").mkString(",")})),
         |  (900004L, array(1.0D, 2.0D))
         |AS t(vec_id, v)""".stripMargin)
    val e = base.unionByName(degenerates)

    def byExpr(m: IvfIndex.Model) = e
      .withColumn("cl", IvfIndex.assignExpr(m, col("v")))
      .select("vec_id", "cl")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    def byBroadcast(m: IvfIndex.Model) = IvfIndex
      .assignBroadcast(e, m)
      .select("vec_id", "cl")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap

    // Path equivalence on a genuinely trained model — train on the sound
    // vectors only (a null mean is not a meaningful centroid), assign all.
    val trained = IvfIndex.train(base, k = 10, iters = 3)
    val bAssign = byBroadcast(trained)
    assert(bAssign === byExpr(trained))
    Seq(900001L, 900002L, 900003L, 900004L).foreach { id =>
      assert(bAssign(id) === 0, s"degenerate vec_id=$id not on the first null-distance centroid")
    }

    // …and on a model larger than the codegen gate, where assignAuto
    // must take the broadcast path and still agree with the expression.
    val big = IvfIndex.Model(Array.tabulate(IvfIndex.LiteralAssignMaxK + 44) { i =>
      Seq.tabulate(dim)(j => math.sin(i * 31 + j * 7).abs + 0.01)
    })
    assert(big.k > IvfIndex.LiteralAssignMaxK)
    val viaAuto = IvfIndex
      .assignAuto(e, big)
      .select("vec_id", "cl")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(viaAuto === byExpr(big))
    assert(viaAuto.values.toSet.size > 1, "degenerate fixture: every vector in one cluster")
  }

  test("spilled assignment: primary cluster identical to assignExpr, 1-2 rows per vector, search dedupes") {
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val model = IvfIndex.train(e, k = 10, iters = 3)

    val plain = e
      .withColumn("cl", IvfIndex.assignExpr(model, col("v")))
      .select("vec_id", "cl").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val spilled = IvfIndex.assignSpilled(e, model, spillMargin = 0.1)
      .select("vec_id", "cl").collect().map(r => (r.getLong(0), r.getInt(1)))
    val byVec = spilled.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    assert(byVec.keySet == plain.keySet, "spill must not add or drop vectors")
    byVec.foreach { case (id, cls) =>
      assert(cls.size >= 1 && cls.size <= 2, s"vec $id spilled to ${cls.size} clusters")
      assert(cls.contains(plain(id)),
        s"vec $id lost its primary cluster ${plain(id)} (got $cls) — spill must be a superset")
    }
    val spillFrac = byVec.values.count(_.size == 2).toDouble / byVec.size
    assert(spillFrac > 0.0 && spillFrac < 1.0,
      s"degenerate spill fraction $spillFrac — margin fixture is vacuous")

    // searchSpilled: no duplicate pairs, dense per-query ranks, and
    // recall vs brute force at least the unspilled search's (the point)
    val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val annS = IvfIndex.searchSpilled(e, probes, model, nProbe = 3, topK = 5, spillMargin = 0.1)
      .collect()
    val pairs = annS.map(r => (r.getLong(0), r.getLong(2)))
    assert(pairs.distinct.length == pairs.length, "spilled search surfaced duplicate pairs")
    annS.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq,
        s"query $q ranks not dense")
    }
    val bf = graft.operators.Similarity.cosineTopK(e, probes, 5)
      .select(col("q_id"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val annP = IvfIndex.search(e, probes, model, nProbe = 3, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hitsS = pairs.count(bf.contains)
    val hitsP = annP.count(bf.contains)
    assert(hitsS >= hitsP,
      s"spill lowered recall: $hitsS spilled hits vs $hitsP plain — boundary replication broken")
  }

  test("indexed search ≡ in-memory search, and the scan prunes to the probed partitions") {
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val model = IvfIndex.train(e, k = 10, iters = 3)
    val path = s"/root/repo/tmp/graft_io/ivf_index_spec"
    IvfIndex.writeIndexed(e, model, path)

    val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val indexed = IvfIndex.searchIndexed(path, probes, model, nProbe = 3, topK = 5)
    val inMem = IvfIndex.search(e, probes, model, nProbe = 3, topK = 5)

    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "rnk", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(key(indexed) === key(inMem))

    // the scan must carry a partition filter on cl and read < k partitions
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
          if s.relation.location.rootPaths.exists(_.toString.contains("ivf_index_spec")) => s
    }
    assert(scans.nonEmpty, "no parquet scan found for the index read")
    val s = scans.head
    assert(s.partitionFilters.nonEmpty, "index scan has no planning-time partition filter")
    val selected = s.selectedPartitions.partitionCount
    // 5 probes × 3 clusters can touch at most 15 distinct ids, but k=10;
    // the pruning contract is: strictly fewer than all populated dirs
    // unless every cluster is genuinely probed
    val populated = new java.io.File(path).listFiles().count(_.getName.startsWith("cl="))
    assert(selected < populated || populated <= 3,
      s"scan read all $populated partitions — no pruning (selected=$selected)")
  }

  test("spilled materialized layout: searchIndexed(spilled) ≡ in-memory searchSpilled") {
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val model = IvfIndex.train(e, k = 10, iters = 3)
    val path = s"/root/repo/tmp/graft_io/ivf_index_spilled_spec"
    IvfIndex.writeIndexedSpilled(e, model, path, spillMargin = 0.1)
    // the layout genuinely spilled: more rows on disk than vectors
    val n = e.count()
    assert(spark.read.parquet(path).count() > n, "spilled layout holds no replicas")

    val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val indexed =
      IvfIndex.searchIndexed(path, probes, model, nProbe = 3, topK = 5, spilled = true)
    val inMem = IvfIndex.searchSpilled(e, probes, model, nProbe = 3, topK = 5, spillMargin = 0.1)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "rnk", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(key(indexed) === key(inMem))
    // dedupe held on the materialized path too
    val pairs = indexed.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length, "indexed spilled search surfaced duplicates")
  }

  test("saved codebook loads bit-exactly and searches identically") {
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val model = IvfIndex.train(e, k = 6, iters = 2)
    val path = "/root/repo/tmp/graft_io/ivf_model_spec"
    IvfIndex.saveModel(spark, model, path)
    val loaded = IvfIndex.loadModel(spark, path)

    // Bit-exact round trip: quantized doubles survive parquet unchanged.
    assert(loaded.k === model.k)
    assert(loaded.centroids.map(_.toSeq).toSeq === model.centroids.map(_.toSeq).toSeq)

    // And the loaded model drives an identical search.
    val probes = e.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"), col("v").as("qv"))
    def key(m: IvfIndex.Model) = IvfIndex.search(e, probes, m, nProbe = 2, topK = 3)
      .select("q_id", "rnk", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(key(loaded) === key(model))
  }
}
