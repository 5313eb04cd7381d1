package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Scratch diagnostics: execute a declared query and print the final
  * (post-AQE) physical plan plus operator census — how many Generate /
  * Exchange / ReusedExchange stages actually ran. Usage:
  *   runMain graft.tools.PlanProbe <queryName> [sfDir]
  */
object PlanProbe {
  /** collect() that also descends into AQE wrappers and every node's
    * subqueries — the one shared plan traversal (PlanAuditSpec /
    * SimilarityJoinSpec delegate here rather than re-implementing). */
  def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = p.collect(pf)
    val nested = p.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case q: QueryStageExec        => q.plan
    }
    val subs = p.collect { case n if n.subqueries.nonEmpty => n.subqueries }.flatten
    here ++ (nested ++ subs).flatMap(collectAll(_)(pf))
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession
      .builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    // execute THIS df's own QueryExecution so AQE finalizes in place and
    // the printed plan is the runtime plan (stage reuse visible), not a
    // pre-execution clone
    val n = df.queryExecution.toRdd.count()
    println(s"== $name rows=$n time=${(System.nanoTime() - t0) / 1e9}s")
    val plan = df.queryExecution.executedPlan
    val gens = collectAll(plan) { case g: org.apache.spark.sql.execution.GenerateExec => g }
    val ex = collectAll(plan) { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    val rex = collectAll(plan) { case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r }
    val bex = collectAll(plan) { case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b }
    println(s"== generates=${gens.size} shuffles=${ex.size} reused=${rex.size} broadcasts=${bex.size}")
    println(plan.toString.linesIterator.take(120).mkString("\n"))
    spark.stop()
  }
}
