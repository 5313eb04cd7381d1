package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sidecar

/** The versioned-sidecar commit protocol (`sources/Sidecar`) in
  * isolation: one atomic pointer carries version + fingerprint, staged
  * versions stay invisible until commit, superseded/debris versions are
  * _DEAD-marked at commit time and swept only past the grace window. */
class SidecarSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_sidecar").toString + "/_idx"

  private def writeStage(stage: String, tag: String): Unit = {
    import spark.implicits._
    Seq(tag).toDF("payload").write.parquet(stage)
  }

  test("no commit, no current: staged data alone is invisible") {
    val root = freshRoot()
    assert(Sidecar.current(spark, root).isEmpty)
    val (v1, stage1) = Sidecar.nextStage(spark, root)
    assert(v1 === 1)
    writeStage(stage1, "a")
    // staged but uncommitted: still no current
    assert(Sidecar.current(spark, root).isEmpty)
  }

  test("commit makes version AND fingerprint visible together; nextStage advances") {
    val root = freshRoot()
    val (v1, stage1) = Sidecar.nextStage(spark, root)
    writeStage(stage1, "a")
    Sidecar.commit(spark, root, v1, Set("f1", "f2"))
    val cur = Sidecar.current(spark, root).get
    assert(cur.version === 1)
    assert(cur.fingerprint === Set("f1", "f2"))
    assert(spark.read.parquet(cur.dataDir).collect().map(_.getString(0)).toSeq === Seq("a"))
    val (v2, _) = Sidecar.nextStage(spark, root)
    assert(v2 === 2)
  }

  test("second commit supersedes; old version is _DEAD-marked and survives the grace window") {
    val root = freshRoot()
    val (v1, s1) = Sidecar.nextStage(spark, root); writeStage(s1, "a")
    Sidecar.commit(spark, root, v1, Set("f1"))
    val (v2, s2) = Sidecar.nextStage(spark, root); writeStage(s2, "b")
    Sidecar.commit(spark, root, v2, Set("f1", "f2")) // default grace: marked, kept
    val cur = Sidecar.current(spark, root).get
    assert(cur.version === 2 && cur.fingerprint === Set("f1", "f2"))
    assert(new java.io.File(s"$root/v=1").exists(), "superseded version swept inside the grace")
    assert(new java.io.File(s"$root/v=1/_DEAD").exists(), "superseded version not marked dead")
    // grace 0: the NEXT commit sweeps it
    val (v3, s3) = Sidecar.nextStage(spark, root); writeStage(s3, "c")
    Sidecar.commit(spark, root, v3, Set("f3"), gcGraceMs = 0L)
    assert(!new java.io.File(s"$root/v=1").exists())
    assert(!new java.io.File(s"$root/v=2").exists())
    assert(Sidecar.current(spark, root).get.version === 3)
  }

  test("crash debris ABOVE the pointer is also marked and swept") {
    val root = freshRoot()
    val (v1, s1) = Sidecar.nextStage(spark, root); writeStage(s1, "a")
    Sidecar.commit(spark, root, v1, Set("f1"))
    // a crashed rebuild left v=7 staged, never committed
    writeStage(s"$root/v=7", "junk")
    assert(Sidecar.current(spark, root).get.version === 1, "debris leaked into current")
    // debris is GC'd by the next commit like any non-live version
    val (v2, s2) = Sidecar.nextStage(spark, root); writeStage(s2, "b")
    Sidecar.commit(spark, root, v2, Set("f2"), gcGraceMs = 0L)
    assert(!new java.io.File(s"$root/v=7").exists(), "debris version survived GC")
    assert(Sidecar.current(spark, root).get.version === 2)
  }

  test("empty fingerprint commits and round-trips (empty-table index)") {
    val root = freshRoot()
    val (v1, s1) = Sidecar.nextStage(spark, root); writeStage(s1, "a")
    Sidecar.commit(spark, root, v1, Set.empty)
    assert(Sidecar.current(spark, root).get.fingerprint === Set.empty[String])
  }
}
