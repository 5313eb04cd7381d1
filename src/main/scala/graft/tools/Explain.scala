package graft.tools

import graft.{GraftSession, SparkEntry}

/** Diagnostic CLI: formatted physical plan + timed execution for one or
  * more declared queries. Run:
  * `runMain graft.tools.Explain <sfDir> <query>...` */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("EXPLAIN_NO_AQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    // per-stage wall/cpu breakdown: which stages the query's time goes to
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val run = si.taskMetrics.executorRunTime / 1e3
        if (run > 0.2 || wall > 0.2)
          println(f"STAGE ${si.stageId}%3d wall=$wall%6.2fs taskRun=$run%7.2fs tasks=${si.numTasks}%3d ${si.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    for (name <- args.tail) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      val t0 = System.nanoTime()
      // collect() drives THIS queryExecution, so the plan printed below is
      // the AQE final plan (count() would plan a separate aggregate query)
      val n = df.collect().length
      println(s"TIMED $name: rows=$n wall=${(System.nanoTime() - t0) / 1e9}s")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
