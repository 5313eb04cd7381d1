package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextIndex
import graft.sources.FileIO
import graft.streaming.StreamSinks

/** The index-maintained streaming sink: every committed batch leaves
  * the table's bloom + postings sidecars FRESH (lookups and phrase
  * search serve without rebuild), refreshes stay O(new files), and a
  * checkpoint replay neither duplicates data nor breaks the indexes. */
class MaintainedSinkSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("append via the sink → indexes refreshed O(new files) → serve without rebuild, " +
    "across a checkpoint restart") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val path = freshDir("maint_tbl") + "/t"
    val ckpt = freshDir("maint_ckpt")
    val idx = TextIndex.defaultIndexDir(path, "doc_id", "text")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    def drain(): Unit = {
      val q = StreamSinks.maintainedParquetSink(
        stream, path, ckpt,
        bloomKeys = Seq("doc_id"),
        postingsCols = Some(("doc_id", "text")))
      q.processAllAvailable(); q.stop()
    }

    // batch 0: bootstrap — both sidecars must exist and SERVE right away
    ms.addData(Seq(1L -> "small query line x", 2L -> "y small query line small query line"))
    drain()
    val (r1, cand1, total1) = FileIO.bloomPointLookup(spark, path, "doc_id", 1L)
    assert(r1.count() === 1L && cand1 >= 1 && total1 >= 1)
    def hits(): Map[Long, Long] = TextIndex
      .phraseSearchIndexed(spark, path, idx, Seq("small", "query", "line"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    assert(hits() === Map(1L -> 1L, 2L -> 2L))

    // batch 1: the refresh must be a DELTA — the new postings version
    // dir carries only the new batch's doc, never a rewrite
    ms.addData(Seq(3L -> "small query line z"))
    drain()
    assert(hits() === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    assert(FileIO.bloomPointLookup(spark, path, "doc_id", 3L)._1.count() === 1L)
    import graft.sources.Sidecar
    val cur = Sidecar.current(spark, idx).get
    assert(cur.liveVersions.size > 1, "refresh rewrote the whole postings index")
    val newest = spark.read.parquet(cur.dataDir)
    assert(newest.select("doc_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(3L),
      "the delta dir carries more than the new batch — O(new files) broke")

    // restart with the same checkpoint and NO new data: a replay must
    // neither duplicate rows nor corrupt the indexes
    drain()
    assert(spark.read.parquet(path).count() === 3L, "replay duplicated data rows")
    assert(hits() === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))

    // maintenance hook is idempotent standalone too
    StreamSinks.refreshIndexes(spark, path, Seq("doc_id"), Some(("doc_id", "text")))
    assert(hits() === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}
