package graft.tools

import java.nio.file.{Files, Paths}

/** Deliverable helper: write `explain("formatted")` for named declared
  * queries to `<outDir>/<query>_<tag>.txt` — the before/after plan
  * evidence the optimization rounds commit under plans/rNN/.
  *
  * Run: `runMain graft.tools.PlanDump <outDir> <tag> <sfDir> <query>...`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args(2)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for (name <- args.drop(3)) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), txt)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
