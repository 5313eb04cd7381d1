package graft.streaming

import java.nio.file.Files
import java.util.concurrent.CountDownLatch
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The CAS half of writer fencing (EpochStore.fence/casTakeover/refence),
  * tested at the EpochStore surface (this spec lives in the streaming
  * package for that reason): takeover of a stale lease goes through an
  * atomic `create(overwrite=false)` on a generation-numbered claim file,
  * so two racing acquirers deterministically get ONE winner; the
  * commit-point refence is generation-matched and never takes over —
  * the pointer-regression scenario (successor commits, then its own
  * lease goes stale, original writer's commit must STILL reject) is
  * pinned end-to-end in WriterFenceSpec.
  */
class CasLeaseSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = graft.GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(): String = {
    val p = Files.createTempDirectory("graft_cas")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def age(path: String, ageMs: Long): Unit = {
    val f = new java.io.File(path)
    assert(f.exists(), s"$path missing")
    assert(f.setLastModified(System.currentTimeMillis() - ageMs))
  }

  private def leaseFile(st: String) = s"$st/_WRITER_LEASE"

  test("two writers racing a graced takeover: exactly one wins, the loser throws") {
    val st = freshDir()
    // a crashed writer's stale lease
    assert(EpochStore.fence(spark, st, Some("app-dead"), graceMs = 50000) == 1L)
    age(leaseFile(st), 100000)

    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Long]]()
    val threads = Seq("app-B", "app-C").map { id =>
      val t = new Thread(() => {
        start.await()
        try results.put(id, Right(EpochStore.fence(spark, st, Some(id), graceMs = 50000)))
        catch { case e: Throwable => results.put(id, Left(e)) }
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(60000))

    import scala.jdk.CollectionConverters._
    val all = results.asScala.toMap
    val wins = all.collect { case (id, Right(g)) => (id, g) }
    val losses = all.collect { case (_, Left(e)) => e }
    assert(wins.size == 1, s"expected exactly one takeover winner, got $all")
    assert(wins.head._2 == 2L, "takeover must bump the lease generation")
    assert(losses.size == 1 && losses.head.isInstanceOf[IllegalStateException],
      s"the losing racer must throw IllegalStateException, got $losses")
    // the lease records the winner at generation 2, claim debris gone
    assert(EpochStore.leaseGen(spark, st) == 2L)
    assert(!new java.io.File(s"${leaseFile(st)}.claim.2").exists(),
      "the winner must drop its claim file")
  }

  test("a live racer's claim blocks takeover; a crashed claimant's stale claim is skipped past") {
    val st = freshDir()
    assert(EpochStore.fence(spark, st, Some("app-dead"), graceMs = 50000) == 1L)
    age(leaseFile(st), 100000)
    // simulate a racing claimant mid-takeover: fresh claim for generation 2
    val claim = new java.io.File(s"${leaseFile(st)}.claim.2")
    assert(claim.createNewFile())
    val ex = intercept[IllegalStateException] {
      EpochStore.fence(spark, st, Some("app-B"), graceMs = 50000)
    }
    assert(ex.getMessage.contains("already claimed"), ex.getMessage)
    // the claimant crashed (claim aged past grace, lease never advanced):
    // the next acquirer SKIPS the dead generation instead of deleting the
    // claim (delete-then-create reintroduces a TOCTOU — see casTakeover's
    // scaladoc) and wins at generation 3; the winner GCs the debris
    age(claim.getPath, 100000)
    assert(EpochStore.fence(spark, st, Some("app-B"), graceMs = 50000) == 3L)
    assert(!claim.exists(), "the winner must GC the skipped stale claim")
  }

  test("two writers racing to reclaim a STALE claim: exactly one wins (no delete/delete TOCTOU)") {
    val st = freshDir()
    assert(EpochStore.fence(spark, st, Some("app-dead"), graceMs = 50000) == 1L)
    age(leaseFile(st), 100000)
    // a crashed claimant's stale claim for generation 2: under the old
    // delete-then-create reclamation, two racers could both delete it and
    // both win; skip-past keeps the exclusive create the only gate
    val claim = new java.io.File(s"${leaseFile(st)}.claim.2")
    assert(claim.createNewFile())
    age(claim.getPath, 100000)

    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Long]]()
    val threads = Seq("app-B", "app-C").map { id =>
      val t = new Thread(() => {
        start.await()
        try results.put(id, Right(EpochStore.fence(spark, st, Some(id), graceMs = 50000)))
        catch { case e: Throwable => results.put(id, Left(e)) }
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(60000))

    import scala.jdk.CollectionConverters._
    val all = results.asScala.toMap
    val wins = all.collect { case (id, Right(g)) => (id, g) }
    assert(wins.size == 1, s"expected exactly one reclamation winner, got $all")
    assert(wins.head._2 == 3L, "the winner must skip the dead claimant's generation")
    assert(EpochStore.leaseGen(spark, st) == 3L)
  }

  test("refence is generation-matched: a same-id writer whose store was taken over and re-acquired rejects") {
    val st = freshDir()
    assert(EpochStore.fence(spark, st, Some("app-A"), graceMs = 50000) == 1L)
    // app-A's old mutation is in flight at generation 1; meanwhile the
    // store is taken over by B and then re-acquired by a RESTARTED app-A
    age(leaseFile(st), 100000)
    assert(EpochStore.fence(spark, st, Some("app-B"), graceMs = 50000) == 2L)
    age(leaseFile(st), 100000)
    assert(EpochStore.fence(spark, st, Some("app-A"), graceMs = 50000) == 3L)
    // the stuck generation-1 mutation reaches its commit point: holder
    // matches (app-A!) but the generation moved — must reject
    val ex = intercept[IllegalStateException] {
      EpochStore.refence(spark, st, Some("app-A"), entryGen = 1L)
    }
    assert(ex.getMessage.contains("generation"), ex.getMessage)
    // the live incarnation commits fine
    EpochStore.refence(spark, st, Some("app-A"), entryGen = 3L)
  }

  test("refence never takes over: a STALE foreign lease still rejects at the commit point") {
    val st = freshDir()
    assert(EpochStore.fence(spark, st, Some("app-B"), graceMs = 50000) == 1L)
    age(leaseFile(st), 100000) // B crashed — entry fence WOULD take this over
    val ex = intercept[IllegalStateException] {
      EpochStore.refence(spark, st, Some("app-A"), entryGen = 1L)
    }
    assert(ex.getMessage.contains("leased to writer 'app-B'"), ex.getMessage)
  }
}
