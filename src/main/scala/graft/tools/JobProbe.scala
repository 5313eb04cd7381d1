package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Diagnostic CLI: per-JOB wall-time breakdown of one or more declared
  * queries under the bench's exact timed action (`.count()`), after one
  * warmup pass. Iterative operators (CC, pageRank, BFS, k-means) spawn
  * one job per round plus materialization/count jobs — this shows where
  * a multi-job query's wall time actually goes, which stage timing alone
  * cannot (`tools/Explain` covers the per-stage view).
  *
  * Run: `runMain graft.tools.JobProbe <sfDir> <query>...`
  * Env: JOBPROBE_RUNS (default 1 timed run after warmup).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long = 0L, var stages: Int = 0,
        var tasks: Int = 0, var shufWrite: Long = 0L, var shufRead: Long = 0L,
        var taskRunMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, e.time)
          // exact stage→job attribution (r19, ADVICE): AQE and
          // checkpoint-spawned jobs overlap, so "most recent open job"
          // misattributed stages under concurrency
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (collecting) jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) jobs.synchronized {
          val si = e.stageInfo
          stageToJob.get(si.stageId).flatMap(jobs.get).orElse(jobs.values.lastOption).foreach { j =>
            j.stages += 1
            j.tasks += si.numTasks
            j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
            j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.taskRunMs += si.taskMetrics.executorRunTime
          }
        }
    })

    for (name <- args.tail) {
      val q = SparkEntry.queries(name)
      q(spark, dir).count() // warmup (JIT, codegen, FS cache) — bench parity
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      collecting = true
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      println(s"===== $name rows=$n wall=${f"$wall%.3f"}s jobs=${jobs.size} =====")
      val snap = jobs.synchronized(jobs.values.toVector)
      for (j <- snap) {
        val w = (j.end - j.start) / 1e3
        println(f"  job ${j.id}%4d wall=$w%7.3fs stages=${j.stages}%2d tasks=${j.tasks}%4d " +
          f"taskRun=${j.taskRunMs / 1e3}%7.2fs shufW=${j.shufWrite / 1024}%8dK shufR=${j.shufRead / 1024}%8dK")
      }
      val gap = wall - snap.map(j => (j.end - j.start) / 1e3).sum
      println(f"  driver/planning gap (wall - sum job walls) = $gap%.3fs")
    }
    spark.stop()
  }
}
