package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. One warmup pass absorbs JVM/codegen warmup, then
  * `SPARK_GRAFT_BENCH_RUNS` (default 5) INTERLEAVED passes over the whole
  * suite time every query once per pass, reporting the per-query median.
  * Samples of one query are therefore separated by a full sweep of the
  * others — deliberate: every sample sees the same suite-ambient heap/GC
  * /page-cache state instead of query-private back-to-back warmth, so
  * the median reflects how the suite actually runs end-to-end.
  * The harness is CONTENTION-AWARE (the
  * round-3 driver recording was ~2.5× a clean run on identical code
  * because end-of-round work shared the box):
  *
  * - a budgeted quiet gate (SPARK_GRAFT_BENCH_QUIET_MAX_SEC, default
  *   600 s total) waits for the 1-minute load average to drop below half
  *   the allotted cores BEFORE the warmup, again before EVERY measured
  *   pass, and once more before a final quarantine re-measure of any
  *   still-flagged queries — so a competing burst pauses the bench at
  *   the next pass boundary instead of polluting the remaining samples;
  *   an exhausted budget is reported as `quiet_gate_timeout`;
  * - a query whose spread (max−min) exceeds its median is re-run up to
  *   two extra times — transient interference shrinks the spread, a
  *   genuinely bimodal query keeps it and stays flagged;
  * - the JSON reports per-query spread, the worst spread/median ratio,
  *   the load averages observed at start and end, and a `contended`
  *   flag (true when any final spread still exceeds its median and that
  *   query's median is non-trivial) — the fail-loud signal that the
  *   recorded numbers should be distrusted and re-run on a quiet box.
  *
  * `SPARK_GRAFT_BENCH_ONLY=a,b,c` restricts to named queries (local
  * iteration); the JSON line goes to stdout AND `SPARK_GRAFT_BENCH_OUT`
  * (default tmp/bench_out.json) so the driver can parse it even when sbt
  * log noise pollutes stdout. Failures print to stderr and report -1 for
  * that query instead of being swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    // GraftSession, NOT a bare builder: the bench must measure the
    // engine AS SHIPPED — broadcast threshold, AQE coalescing floor,
    // extensions — or its numbers describe a session no user runs.
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

    // (total, steal) jiffies from /proc/stat — steal measures HOST-level
    // contention (a noisy co-tenant VM) that guest loadavg cannot see;
    // a non-trivial steal fraction over the run is the evidence that an
    // inflated recording reflects the box, not the engine.
    def cpuJiffies(): (Long, Long) =
      try {
        val cols = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)
        (cols.sum, if (cols.length > 7) cols(7) else 0L)
      } catch { case _: Throwable => (0L, 0L) }

    // Serialize against competing load: a box already saturated by
    // another job would inflate every sample. The round-3 AND round-4
    // driver recordings both shipped contended (end-of-round work shares
    // the box and outlives a short grace), so the gate is a BUDGETED
    // LOOP-WAIT applied before the warmup and re-applied before every
    // measured pass — a burst that starts mid-run pauses the bench
    // instead of polluting the remaining passes. Our own JVM is idle at
    // each gate (between passes all queries have completed), so loadavg
    // reflects the other tenants. Budget via
    // SPARK_GRAFT_BENCH_QUIET_MAX_SEC (default 600); if it runs dry the
    // bench proceeds and says so (`quiet_gate_timeout`) rather than
    // shipping silently-distrusted numbers.
    val loadStart = loadAvg()
    val quietBar = math.max(2.0, cpus.toDouble / 2)
    val quietBudget = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_MAX_SEC", "600").toInt
    var waited = 0
    def waitQuiet(): Unit =
      while (loadAvg() > quietBar && waited < quietBudget) { Thread.sleep(5000); waited += 5 }
    waitQuiet()

    val (jifT0, jifS0) = cpuJiffies()
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          -1.0
      }
    }
    names.foreach(once) // warmup pass (JIT + codegen + FS cache)
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
    for (_ <- 1 to nRuns) {
      waitQuiet() // re-gate: a burst that started mid-run pauses the bench
      for (n <- names)
        samples(n) = samples.getOrElse(n, Vector.empty) :+ once(n)
    }

    // lower-middle median: with an even survivor count this takes the
    // FASTER middle sample — a transient failure or interference burst
    // must not bias the reported time toward the slowest survivors
    def medianOf(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.sorted.apply((ok.size - 1) / 2)
    }
    def spreadOf(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0)
      if (ok.isEmpty) 0.0 else ok.max - ok.min
    }

    // contention retry: spread > median means the samples disagree by
    // more than the value being reported — re-measure up to twice. Each
    // retry REPLACES the worst sample (one suspected-interference
    // victim) rather than appending: max−min over a grow-only sample set
    // can never shrink, so appending would make recovery impossible. A
    // genuinely bimodal query keeps producing slow samples, re-fills the
    // top, and stays flagged; one interfered sample is displaced by a
    // clean re-measurement and the flag clears.
    def isContended(n: String): Boolean = {
      val ts = samples(n); val m = medianOf(ts)
      m > 0.05 && spreadOf(ts) > m
    }
    for (n <- names) {
      var extra = 0
      while (extra < 2 && isContended(n)) {
        val ts = samples(n)
        samples(n) = ts.patch(ts.indexOf(ts.max), Nil, 1) :+ once(n)
        extra += 1
      }
    }

    // Quarantine pass: queries still flagged after per-query retries are
    // the ones a mid-run burst hit hardest. Wait for quiet once more
    // (same budget) and replace each one's worst sample with a fresh
    // measurement — a clean box clears the flag, a genuinely bimodal
    // query survives it and stays flagged.
    if (names.exists(isContended)) {
      waitQuiet()
      for (n <- names if isContended(n)) {
        val ts = samples(n)
        samples(n) = ts.patch(ts.indexOf(ts.max), Nil, 1) :+ once(n)
      }
    }

    val results = names.map { n => (n, medianOf(samples(n)), spreadOf(samples(n))) }
    val qs = results.map { case (k, med, _) => "\"" + k + "\":" + med }.mkString("{", ",", "}")
    val spreads = results.map { case (k, _, sp) => "\"" + k + "\":" + sp }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val ratios = results.collect { case (_, med, sp) if med > 0.05 => sp / med }
    val maxRatio = if (ratios.isEmpty) 0.0 else ratios.max
    val contended = results.exists { case (_, med, sp) => med > 0.05 && sp > med }
    val loadEnd = loadAvg()
    val (jifT1, jifS1) = cpuJiffies()
    val stealFrac =
      if (jifT1 > jifT0) (jifS1 - jifS0).toDouble / (jifT1 - jifT0) else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spreads,""" +
        s""""runs":$nRuns,"max_spread_ratio":$maxRatio,"contended":$contended,""" +
        s""""loadavg_start":$loadStart,"loadavg_end":$loadEnd,"quiet_wait_sec":$waited,""" +
        s""""quiet_gate_timeout":${waited >= quietBudget},""" +
        s""""cpu_steal_frac":$stealFrac,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/tmp/bench_out.json")
    try {
      val p = Paths.get(out)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.writeString(p, json + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    println(json)
    spark.stop()
  }
}
