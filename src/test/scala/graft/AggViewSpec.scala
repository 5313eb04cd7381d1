package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.AggView

/** The incremental materialized aggregate view (`streaming/AggView`):
  * maintained totals ≡ one-pass recomputation, replay is a structural
  * no-op (additive merges are NOT naturally idempotent — the batchId
  * ledger makes them so), crash debris before the pointer flip is
  * invisible and overwritten, and the streaming sink survives a
  * checkpoint restart without double-counting. */
class AggViewSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()

  private def tmp() = java.nio.file.Files.createTempDirectory("agg_view").toString

  private def df(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "x")
  }

  private def totals(dir: String): Map[String, (Long, Long)] =
    AggView
      .read(spark, dir)
      .collect()
      .map(r => r.getAs[String]("k") -> ((r.getAs[Long]("n"), r.getAs[Long]("sum_x"))))
      .toMap

  test("incremental merge: new keys enter, untouched keys carry over, sums add") {
    val dir = tmp()
    assert(AggView.applyBatch(spark, dir, 0L, df("a" -> 1L, "a" -> 2L, "b" -> 10L), Seq("k"), Seq("x")))
    assert(totals(dir) === Map("a" -> ((2L, 3L)), "b" -> ((1L, 10L))))
    // batch 1 touches a, adds c, never mentions b
    assert(AggView.applyBatch(spark, dir, 1L, df("a" -> 4L, "c" -> 7L), Seq("k"), Seq("x")))
    assert(totals(dir) === Map("a" -> ((3L, 7L)), "b" -> ((1L, 10L)), "c" -> ((1L, 7L))))
  }

  test("replayed batchId is refused and touches nothing") {
    val dir = tmp()
    AggView.applyBatch(spark, dir, 0L, df("a" -> 1L), Seq("k"), Seq("x"))
    AggView.applyBatch(spark, dir, 1L, df("a" -> 2L), Seq("k"), Seq("x"))
    val before = totals(dir)
    val (vBefore, _) = AggView.pointer(spark, dir)
    // at-least-once redelivery of batch 1, and an ANCIENT replay of 0
    assert(!AggView.applyBatch(spark, dir, 1L, df("a" -> 2L), Seq("k"), Seq("x")))
    assert(!AggView.applyBatch(spark, dir, 0L, df("a" -> 1L), Seq("k"), Seq("x")))
    assert(totals(dir) === before)
    assert(AggView.pointer(spark, dir)._1 === vBefore)
  }

  test("crash debris before the pointer flip is invisible and overwritten") {
    val dir = tmp()
    AggView.applyBatch(spark, dir, 0L, df("a" -> 1L), Seq("k"), Seq("x"))
    // simulate a crashed apply: orphan v=2 written, pointer NOT flipped
    df("a" -> 999L).write.parquet(s"$dir/v=2")
    assert(totals(dir) === Map("a" -> ((1L, 1L))), "orphan version must be invisible")
    // the next real apply overwrites the debris and commits
    assert(AggView.applyBatch(spark, dir, 1L, df("a" -> 5L), Seq("k"), Seq("x")))
    assert(totals(dir) === Map("a" -> ((2L, 6L))))
  }

  test("superseded-version GC honors the grace window; grace 0 sweeps immediately") {
    val dir = tmp()
    // three rapid applies with the default (10-min) grace: a reader that
    // resolved the pointer at v=1 just before the rapid applies must still
    // find its version directory
    AggView.applyBatch(spark, dir, 0L, df("a" -> 1L), Seq("k"), Seq("x"))
    AggView.applyBatch(spark, dir, 1L, df("a" -> 2L), Seq("k"), Seq("x"))
    AggView.applyBatch(spark, dir, 2L, df("a" -> 3L), Seq("k"), Seq("x"))
    assert(new java.io.File(s"$dir/v=1").exists(),
      "a just-superseded version must survive the grace window")
    assert(totals(dir) === Map("a" -> ((3L, 6L))))
    // grace 0 = no window: the next apply sweeps everything below v
    AggView.applyBatch(spark, dir, 3L, df("a" -> 4L), Seq("k"), Seq("x"), gcGraceMs = 0L)
    assert(!new java.io.File(s"$dir/v=1").exists() && !new java.io.File(s"$dir/v=2").exists(),
      "grace 0 must sweep superseded versions")
    assert(totals(dir) === Map("a" -> ((4L, 10L))))
  }

  private def bucketedTotals(dir: String): Map[String, (Long, Long)] =
    AggView
      .readBucketed(spark, dir)
      .collect()
      .map(r => r.getAs[String]("k") -> ((r.getAs[Long]("n"), r.getAs[Long]("sum_x"))))
      .toMap

  test("bucketed mode: totals ≡ flat mode, replay refused, only touched buckets rewritten") {
    val flat = tmp(); val buck = tmp()
    val batches = Seq(
      df("a" -> 1L, "a" -> 2L, "b" -> 10L),
      df("a" -> 4L, "c" -> 7L),
      df("b" -> 5L, "d" -> 9L))
    batches.zipWithIndex.foreach { case (b, i) =>
      AggView.applyBatch(spark, flat, i.toLong, b, Seq("k"), Seq("x"))
      AggView.applyBatchBucketed(spark, buck, i.toLong, b, Seq("k"), Seq("x"), nBuckets = 8)
    }
    assert(bucketedTotals(buck) === totals(flat), "bucketed totals must equal flat totals")
    // replay no-op
    assert(!AggView.applyBatchBucketed(spark, buck, 1L, batches(1), Seq("k"), Seq("x"), 8))
    assert(bucketedTotals(buck) === totals(flat))
    // selective rewrite: a batch touching ONE key writes only that key's
    // bucket into the new version dir
    val (vBefore, _, nBefore, mapBefore) = AggView.bucketedPointer(spark, buck)
    assert(nBefore === 8)
    AggView.applyBatchBucketed(spark, buck, 3L, df("a" -> 100L), Seq("k"), Seq("x"), 8)
    val (vAfter, _, _, mapAfter) = AggView.bucketedPointer(spark, buck)
    assert(vAfter === vBefore + 1)
    val newDirBuckets = Option(new java.io.File(s"$buck/v=$vAfter").listFiles())
      .getOrElse(Array.empty).filter(f => f.isDirectory && f.getName.startsWith("b=")).toSeq
    assert(newDirBuckets.length === 1,
      s"a one-key batch must rewrite exactly one bucket, got ${newDirBuckets.map(_.getName)}")
    // untouched buckets still point at their old versions
    val aBucket = mapAfter.find { case (_, v) => v == vAfter }.map(_._1).get
    assert((mapAfter - aBucket) === (mapBefore - aBucket),
      "untouched buckets' version pointers must not move")
    assert(bucketedTotals(buck)("a") === ((4L, 107L)))
  }

  test("bucketed mode: a different nBuckets than the committed modulus is refused loudly") {
    val dir = tmp()
    AggView.applyBatchBucketed(spark, dir, 0L, df("a" -> 1L), Seq("k"), Seq("x"), nBuckets = 8)
    // apply with a different modulus: old totals would land in buckets the
    // merge never reads → must refuse BEFORE touching anything
    val exApply = intercept[IllegalArgumentException] {
      AggView.applyBatchBucketed(spark, dir, 1L, df("a" -> 2L), Seq("k"), Seq("x"), nBuckets = 4)
    }
    assert(exApply.getMessage.contains("nBuckets=8"))
    assert(bucketedTotals(dir) === Map("a" -> ((1L, 1L))), "refused apply must not mutate")
    // read asserting the wrong modulus is refused too
    intercept[IllegalArgumentException] {
      AggView.readBucketed(spark, dir, expectedNBuckets = 4)
    }
    // the committed modulus still works for both
    AggView.applyBatchBucketed(spark, dir, 1L, df("a" -> 2L), Seq("k"), Seq("x"), nBuckets = 8)
    assert(AggView.readBucketed(spark, dir, expectedNBuckets = 8).count() === 1L)
  }

  test("bucketed GC: dead versions are marked at supersede time and swept after the grace") {
    val dir = tmp()
    // nBuckets=1: every apply supersedes the whole previous version
    AggView.applyBatchBucketed(spark, dir, 0L, df("a" -> 1L), Seq("k"), Seq("x"), 1)
    AggView.applyBatchBucketed(spark, dir, 1L, df("a" -> 2L), Seq("k"), Seq("x"), 1)
    // default grace: v=1 is dead (marked) but must survive for in-flight readers
    assert(new java.io.File(s"$dir/v=1").exists())
    assert(new java.io.File(s"$dir/v=1/_DEAD").exists(), "dead version must be marked")
    // grace 0 sweeps dead versions immediately
    AggView.applyBatchBucketed(spark, dir, 2L, df("a" -> 3L), Seq("k"), Seq("x"), 1, gcGraceMs = 0L)
    assert(!new java.io.File(s"$dir/v=1").exists() && !new java.io.File(s"$dir/v=2").exists())
    assert(bucketedTotals(dir) === Map("a" -> ((3L, 6L))))
  }

  test("bucketed streaming sink: checkpoint restart re-delivers without double-counting") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp()
    val in = MemoryStream[(String, Long)]
    in.addData("a" -> 1L, "b" -> 2L)
    AggView.sinkBucketed(in.toDF().toDF("k", "x"), s"$dir/view", Seq("k"), Seq("x"), 8, s"$dir/ckpt")
      .awaitTermination()
    in.addData("a" -> 10L)
    AggView.sinkBucketed(in.toDF().toDF("k", "x"), s"$dir/view", Seq("k"), Seq("x"), 8, s"$dir/ckpt")
      .awaitTermination()
    assert(bucketedTotals(s"$dir/view") === Map("a" -> ((2L, 11L)), "b" -> ((1L, 2L))))
  }

  test("streaming sink: checkpoint restart re-delivers without double-counting") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp()
    val in = MemoryStream[(String, Long)]
    in.addData("a" -> 1L, "b" -> 2L)
    AggView.sink(in.toDF().toDF("k", "x"), s"$dir/view", Seq("k"), Seq("x"), s"$dir/ckpt")
      .awaitTermination()
    // restart from the SAME checkpoint with more data: the recovered
    // run may re-offer earlier batches; the ledger must hold the line
    in.addData("a" -> 10L)
    AggView.sink(in.toDF().toDF("k", "x"), s"$dir/view", Seq("k"), Seq("x"), s"$dir/ckpt")
      .awaitTermination()
    assert(totals(s"$dir/view") === Map("a" -> ((2L, 11L)), "b" -> ((1L, 2L))))
  }
}
