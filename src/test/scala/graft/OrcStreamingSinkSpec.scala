package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamSinks
import scala.jdk.CollectionConverters._

/** Pins the exactly-once contract of the streaming ORC sink — the
  * automated version of the reference's manual protocol test
  * (reference README.md:7-22, OrcSinkTest.java:12-43):
  *
  * 1. committed rows are visible to a manifest-aware reader;
  * 2. orphan files (crash debris that never committed — the reference's
  *    `.in-process`/`.in-pending` states) are INVISIBLE to readers even
  *    though they sit in the output directory;
  * 3. restart from the checkpoint resumes the stream with no duplicates
  *    and no loss (offsets WAL + idempotent manifest commit).
  */
class OrcStreamingSinkSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  case class Ev(id: Long, ts: Timestamp, etype: String, value: Double)
  private def ev(id: Long, etype: String): Ev =
    Ev(id, new Timestamp(1704067200000L + id * 60000L), etype, id * 1.5)

  test("exactly-once partitioned ORC sink: commit visibility, orphan invisibility, restart no-dup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = freshDir("orc_out")
    val ckpt = freshDir("orc_ckpt")
    val stream = MemoryStream[Ev]

    // Phase 1: two batches land and commit.
    stream.addData((1L to 6L).map(i => ev(i, if (i % 2 == 0) "click" else "view")): _*)
    val q1 = StreamSinks.orcSink(stream.toDF(), out, ckpt, Seq("etype"))
    q1.processAllAvailable()
    q1.stop()

    val afterPhase1 = spark.read.orc(out)
    assert(afterPhase1.count() === 6)
    assert(afterPhase1.select("etype").distinct().count() === 2)

    // Phase 2: plant an orphan ORC file — crash debris that never reached
    // the manifest (the reference's in-process file, README.md:15-16).
    val clickDir = Paths.get(out, "etype=click")
    val committed: Path = Files
      .list(clickDir)
      .iterator()
      .asScala
      .filter(_.toString.endsWith(".orc"))
      .toSeq
      .head
    val orphan = clickDir.resolve("part-99999-orphan-crash-debris.orc")
    Files.copy(committed, orphan, StandardCopyOption.REPLACE_EXISTING)

    // A manifest-aware reader must not see the orphan's rows...
    assert(spark.read.orc(out).count() === 6, "orphan file leaked into reader")
    // ...and the committed-file listing must exclude it.
    val files = StreamSinks.committedFiles(spark, out)
    assert(files.nonEmpty && !files.exists(_.contains("orphan")), s"orphan listed: $files")

    // Phase 3: restart from the same checkpoint, stream more data.
    stream.addData((7L to 10L).map(i => ev(i, "click")): _*)
    val q2 = StreamSinks.orcSink(stream.toDF(), out, ckpt, Seq("etype"))
    q2.processAllAvailable()
    q2.stop()

    val fin = spark.read.orc(out)
    assert(fin.count() === 10, "restart lost or duplicated rows")
    // Exactly once: every id appears exactly once.
    val dups = fin.groupBy("id").count().filter(col("count") > 1).count()
    assert(dups === 0, "duplicate rows after restart")
    assert(fin.select(sum("id")).as[Double].head() === 55.0)
  }

  test("vacuum lists exactly the orphans, deletes them, and committed reads are unchanged") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = freshDir("vac_out")
    val ckpt = freshDir("vac_ckpt")
    val stream = MemoryStream[Ev]
    stream.addData(ev(1, "a"), ev(2, "b"), ev(3, "a"), ev(4, "b"))
    val q = StreamSinks.orcSink(stream.toDF(), out, ckpt, Seq("etype"))
    q.processAllAvailable()
    q.stop()

    // Plant crash debris in BOTH partition dirs.
    for (part <- Seq("etype=a", "etype=b")) {
      val dir = Paths.get(out, part)
      val committed = Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".orc")).toSeq.head
      Files.copy(committed, dir.resolve("part-99999-vacuum-orphan.orc"),
        StandardCopyOption.REPLACE_EXISTING)
    }

    val before = spark.read.orc(out).count()
    // Default 10-minute grace window: the seconds-old debris is NOT yet
    // sweepable — a concurrent batch's in-flight files look identical,
    // and mtime age is the only signal that distinguishes them.
    assert(StreamSinks.vacuum(spark, out, dryRun = true).isEmpty,
      "grace window failed to protect fresh files")

    val dry = StreamSinks.vacuum(spark, out, dryRun = true, graceMs = 0L)
    assert(dry.size === 2 && dry.forall(_.contains("vacuum-orphan")), s"dry run listed: $dry")
    assert(Files.exists(Paths.get(out, "etype=a", "part-99999-vacuum-orphan.orc")),
      "dry run must not delete")

    val swept = StreamSinks.vacuum(spark, out, graceMs = 0L)
    assert(swept.toSet === dry.toSet)
    for (part <- Seq("etype=a", "etype=b"))
      assert(!Files.exists(Paths.get(out, part, "part-99999-vacuum-orphan.orc")), "orphan survived")
    assert(spark.read.orc(out).count() === before, "vacuum changed committed data")
    assert(StreamSinks.vacuum(spark, out, dryRun = true, graceMs = 0L).isEmpty,
      "second sweep found residue")
  }

  test("vacuum refuses to run while an active query is still writing the path") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = freshDir("vac_live_out")
    val ckpt = freshDir("vac_live_ckpt")
    val stream = MemoryStream[Ev]
    stream.addData(ev(1, "a"), ev(2, "b"))
    // ProcessingTime trigger keeps the query ACTIVE after the drain
    // (AvailableNow would self-terminate and defeat the guard's purpose).
    val q = StreamSinks.orcSink(
      stream.toDF(), out, ckpt, Seq("etype"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(60000L))
    try {
      q.processAllAvailable()
      val e = intercept[IllegalArgumentException] {
        StreamSinks.vacuum(spark, out, dryRun = true, graceMs = 0L)
      }
      assert(e.getMessage.contains("stop the writer"), s"wrong refusal: ${e.getMessage}")
    } finally q.stop()
    // Writer stopped → the sweep proceeds (and finds nothing).
    assert(StreamSinks.vacuum(spark, out, dryRun = true, graceMs = 0L).isEmpty)
  }

  test("vacuum refuses while any active query has no progress yet (sink unknowable)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // A committed sink dir the sweep would otherwise happily run on.
    val out = freshDir("vac_noprog_out")
    val ckpt = freshDir("vac_noprog_ckpt")
    val seed = MemoryStream[Ev]
    seed.addData(ev(1, "a"))
    StreamSinks.orcSink(seed.toDF(), out, ckpt, Seq("etype")).awaitTermination()

    // A second query whose FIRST batch is still in flight: lastProgress
    // is null until batch 0 completes, so its sink is unknowable — the
    // pre-fix guard matched it against nothing and swept anyway.
    val blocker = MemoryStream[Ev]
    blocker.addData(ev(2, "b"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val q = blocker
      .toDF()
      .writeStream
      .option("checkpointLocation", freshDir("vac_noprog_ckpt2"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count()
        entered.countDown()
        gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
        ()
      }
      .start()
    try {
      assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS), "batch 0 never started")
      assert(q.lastProgress == null, "batch 0 already reported progress — test premise broken")
      val e = intercept[IllegalArgumentException] {
        StreamSinks.vacuum(spark, out, dryRun = true, graceMs = 0L)
      }
      assert(e.getMessage.contains("no progress yet"), s"wrong refusal: ${e.getMessage}")
    } finally {
      gate.countDown()
      q.processAllAvailable()
      q.stop()
    }
    // No unknowable writers left → the sweep proceeds (and finds nothing).
    assert(StreamSinks.vacuum(spark, out, dryRun = true, graceMs = 0L).isEmpty)
  }

  test("promote makes the committed set visible to manifest-UNAWARE readers, across restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = freshDir("promote_out")
    val ckpt = freshDir("promote_ckpt")
    val stream = MemoryStream[Ev]

    // A manifest-less copy of the sink dir IS the non-Spark reader:
    // plain file listing, no _spark_metadata to consult — what Hive /
    // Trino / DuckDB see over the directory glob.
    def plainReadCount(): Long = {
      val copy = Files.createTempDirectory("graft_promote_copy")
      copy.toFile.deleteOnExit()
      Files.walk(Paths.get(out)).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filterNot(_.toString.contains("_spark_metadata"))
        .foreach { p =>
          val rel = Paths.get(out).relativize(p)
          val dst = copy.resolve(rel.toString)
          Files.createDirectories(dst.getParent)
          Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
        }
      spark.read.orc(copy.toString).count()
    }

    // Phase 1: commit a batch, plant crash debris.
    stream.addData(ev(1, "a"), ev(2, "b"), ev(3, "a"))
    val q1 = StreamSinks.orcSink(stream.toDF(), out, ckpt, Seq("etype"))
    q1.processAllAvailable(); q1.stop()
    val aDir = Paths.get(out, "etype=a")
    val committedFile = Files.list(aDir).iterator().asScala
      .filter(_.toString.endsWith(".orc")).toSeq.head
    Files.copy(committedFile, aDir.resolve("part-99999-debris.orc"),
      StandardCopyOption.REPLACE_EXISTING)
    assert(plainReadCount() > 3, "debris invisible to the plain reader — fixture is vacuous")

    val r1 = StreamSinks.promote(spark, out)
    assert(r1.sweptOrphans.size === 1 && r1.committedFiles > 0)
    assert(plainReadCount() === 3, "plain reader diverges from committed set after promote")

    // Phase 2: crash-restart from the checkpoint, more data, new debris.
    stream.addData(ev(4, "b"), ev(5, "a"))
    val q2 = StreamSinks.orcSink(stream.toDF(), out, ckpt, Seq("etype"))
    q2.processAllAvailable(); q2.stop()
    Files.copy(committedFile, Paths.get(out, "etype=b").resolve("part-99998-debris.orc"),
      StandardCopyOption.REPLACE_EXISTING)

    val r2 = StreamSinks.promote(spark, out)
    assert(r2.sweptOrphans.size === 1)
    assert(plainReadCount() === 5, "plain reader diverges after restart + promote")
    // Idempotent: a second promote sweeps nothing and changes nothing.
    assert(StreamSinks.promote(spark, out).sweptOrphans.isEmpty)
    assert(plainReadCount() === 5)

    // Lifecycle handoff: after a green promote the directory IS a plain
    // table — drop the manifest and batch maintenance (compact) applies
    // with rows intact. This is the streaming→batch table conversion the
    // reference gets for free from its rename protocol.
    val meta = Paths.get(out, "_spark_metadata")
    Files.walk(meta).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    val compacted = freshDir("promote_compacted")
    graft.sources.FileIO.compact(spark, out, compacted, targetFileBytes = 64L * 1024 * 1024, format = "orc")
    assert(spark.read.orc(compacted).count() === 5, "compaction after manifest drop changed rows")
  }

  test("registered catalog table serves exactly the committed rows across crash-restart, with partition pruning") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = freshDir("catalog_out")
    val ckpt = freshDir("catalog_ckpt")
    val table = "graft_catalog_spec_events"
    val stream = MemoryStream[Ev]

    // Phase 1: commit a batch, plant crash debris, promote, register.
    stream.addData(ev(1, "click"), ev(2, "view"), ev(3, "click"), ev(4, "view"))
    val q1 = StreamSinks.orcSink(stream.toDF(), out, ckpt, Seq("etype"))
    q1.processAllAvailable(); q1.stop()
    val clickDir = Paths.get(out, "etype=click")
    val committedFile = Files.list(clickDir).iterator().asScala
      .filter(_.toString.endsWith(".orc")).toSeq.head
    Files.copy(committedFile, clickDir.resolve("part-99999-debris.orc"),
      StandardCopyOption.REPLACE_EXISTING)

    StreamSinks.promote(spark, out)
    val nParts = StreamSinks.registerTable(spark, table, out, "orc", Seq("etype"))
    assert(nParts === 2, "partition recovery must load both etype dirs")
    // by NAME, no path, exactly the committed rows — the swept debris
    // never shows (catalog readers list plainly, which promote verified)
    assert(spark.table(table).count() === 4)
    assert(spark.table(table).select(sum("id")).as[Double].head() === 10.0)

    // PARTITION PRUNING: the partition filter must reach the scan as a
    // PartitionFilter (planning-time directory pruning via the catalog,
    // the reference's Hive-table read pattern) ...
    val pruned = spark.table(table).filter(col("etype") === "click")
    assert(pruned.count() === 2)
    val scanMeta = pruned.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc.metadata
    }.head
    assert(scanMeta("PartitionFilters").contains("etype"),
      s"partition filter not pushed to the scan: $scanMeta")
    // ... and MEASURABLY: executing the pruned scan reads exactly ONE
    // file (the click partition's), per the scan node's own metric — the
    // other partition's directory is never opened.
    val clickRows = spark.table(table).filter(col("etype") === "click").select("id")
    clickRows.collect()
    val scanExec = clickRows.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.head
    assert(scanExec.metrics("numFiles").value === 1,
      s"pruned scan read ${scanExec.metrics("numFiles").value} files, expected 1")

    // Phase 2: crash-restart from the checkpoint, more commits; the
    // operator re-runs promote + partition recovery at the batch
    // boundary and the table serves the superset, still no dups.
    stream.addData(ev(5, "click"), ev(6, "purchase"))
    val q2 = StreamSinks.orcSink(stream.toDF(), out, ckpt, Seq("etype"))
    q2.processAllAvailable(); q2.stop()
    StreamSinks.promote(spark, out)
    spark.catalog.recoverPartitions(table)
    spark.catalog.refreshTable(table)
    assert(spark.table(table).count() === 6, "restart lost or duplicated rows through the table")
    assert(spark.table(table).groupBy("id").count().filter(col("count") > 1).count() === 0)
    assert(spark.sql(s"SHOW PARTITIONS `$table`").count() === 3)
    // registration is EXTERNAL: dropping the table leaves the data
    spark.sql(s"DROP TABLE `$table`")
    assert(spark.read.orc(out).count() === 6, "DROP TABLE must not delete external sink files")
  }

  test("parquet streaming sink commits through the manifest too") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = freshDir("pq_out")
    val ckpt = freshDir("pq_ckpt")
    val stream = MemoryStream[Ev]
    stream.addData(ev(1, "a"), ev(2, "b"), ev(3, "a"))
    val q = StreamSinks.parquetSink(stream.toDF(), out, ckpt)
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(out).count() === 3)
    assert(Files.exists(Paths.get(out, "_spark_metadata")))
  }

  test("watermark listener surfaces event-time watermark (reference R12 gauge)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val listener = new StreamSinks.WatermarkListener
    spark.streams.addListener(listener)
    try {
      val out = freshDir("wm_out")
      val ckpt = freshDir("wm_ckpt")
      val stream = MemoryStream[Ev]
      stream.addData((1L to 20L).map(i => ev(i, "x")): _*)
      val agg = stream
        .toDF()
        .withWatermark("ts", "5 minutes")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
      val q = agg.writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      val id = q.id
      q.stop()
      val wm = listener.watermark(id)
      assert(wm.isDefined && wm.get.startsWith("2024-01-01"), s"watermark not surfaced: $wm")
    } finally spark.streams.removeListener(listener)
  }
}
