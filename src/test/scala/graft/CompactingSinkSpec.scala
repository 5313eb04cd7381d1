package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Optimize, StreamSinks}

/** The self-compacting manifest sink (StreamSinks.compactingParquetSink,
  * r17): a long soak's committed file count saw-tooths around the
  * small-file threshold instead of growing O(batches) — the reference's
  * file-per-checkpoint growth flaw closed at the sink; exactly-once
  * holds across checkpoint restarts AND across auto-compactions; crash
  * debris from an interrupted compaction heals before the next append;
  * index sidecars stay fresh and correct through the reclaim. */
class CompactingSinkSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def diskDataFiles(out: String): Int = {
    def walk(p: java.io.File): Seq[java.io.File] =
      Option(p.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.getName.startsWith("_") || f.getName.startsWith(".")) Nil
        else if (f.isDirectory) walk(f)
        else Seq(f)
      }
    walk(new java.io.File(out)).count(_.getName.endsWith(".parquet"))
  }

  test("soak: committed AND on-disk file counts saw-tooth; exactly-once across restarts; " +
    "sidecars stay correct") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val out = freshDir("csink_out")
    val ckpt = freshDir("csink_ckpt")
    val stream = MemoryStream[(Long, Double)]

    def drive(rows: Seq[(Long, Double)]): Unit = {
      stream.addData(rows: _*)
      val q = StreamSinks.compactingParquetSink(
        stream.toDF().toDF("id", "v"), out, ckpt,
        maxSmallFiles = 4, smallFileBytes = 1024 * 1024,
        targetFileBytes = 64L * 1024 * 1024, bloomKeys = Seq("id"))
      q.processAllAvailable(); q.stop() // every batch is also a checkpoint restart
    }

    var maxCommitted = 0
    var sawCompacted = false
    (0 until 12).foreach { b =>
      drive((b * 10L until b * 10L + 10).map(i => (i, i * 1.0)))
      val files = StreamSinks.committedFiles(spark, out, "parquet")
      maxCommitted = math.max(maxCommitted, files.size)
      if (files.exists(_.contains("graft-compact-"))) sawCompacted = true
      assert(files.size <= 10,
        s"batch $b: committed file count ${files.size} escaped the policy bound")
    }
    assert(sawCompacted, "no auto-compaction fired in 12 batches of tiny files")
    assert(maxCommitted <= 10 && maxCommitted >= 4,
      s"saw-tooth ceiling $maxCommitted out of the expected band")
    // 12 batches x up to 4 task files would be ~48 without the policy
    val t = spark.read.parquet(out)
    assert(t.count() == 120, "soak lost or duplicated rows")
    assert(t.select("id").distinct().count() == 120, "duplicate ids after restarts")
    // reclaim-on-compact keeps the DISK bounded too (retirees + orphans gone)
    assert(diskDataFiles(out) <= 12,
      s"on-disk file count ${diskDataFiles(out)} grew past the reclaim bound")
    // reclaim traded history away — by design for this sink
    assert(Optimize.listVersions(spark, out).forall(_ => true)) // no crash listing
    // the per-batch-refreshed bloom sidecar serves EXACT results through
    // compactions: one row per key, never a retired duplicate
    val (rows55, cand, total) = graft.sources.FileIO.bloomPointLookup(spark, out, "id", 55L)
    assert(rows55.count() == 1, "sidecar lookup lost or duplicated a row through compaction")
    assert(cand <= total)

    // crash debris from an interrupted compaction heals before the next
    // append (rolled back; the live manifest stays authoritative)
    val stage = Paths.get(out, "_graft_optimize_stage_meta")
    Files.createDirectory(stage)
    Files.writeString(stage.resolve("0"), "garbage-uncommitted")
    drive(Seq((1000L, 1.0)))
    assert(!Files.exists(stage), "debris survived the healing append")
    assert(spark.read.parquet(out).count() == 121)

    // index hooks without reclaim are refused loudly (silent-duplicate hazard)
    intercept[IllegalArgumentException] {
      StreamSinks.compactingParquetSink(
        stream.toDF().toDF("id", "v"), out, ckpt,
        reclaimOnCompact = false, bloomKeys = Seq("id"))
    }
  }
}
