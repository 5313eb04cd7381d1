package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextIndex

/** Measures the MAX-SCORE pruned BM25 path (r18) against the full
  * indexed path, with the result sets asserted IDENTICAL in-probe (the
  * pruned path is an optimization, never an approximation). Two stages:
  *
  * 1. The sf documents FIXTURE (selective-only / mixed / common-only
  *    queries, term selection from the corpus itself) — records the
  *    honest small-corpus answer at the gate's own scale.
  * 2. A SYNTHETIC corpus (default 2M docs, ~20 words each) with a
  *    stop word in EVERY doc and a needle term in every 2000th — the
  *    shape the prune exists for: the common-only population (~2M
  *    docs) skips the per-doc score shuffle + top-k sort, while the
  *    candidate set (1000 docs) is scored fully.
  *
  * What the numbers can and cannot show: both paths read every query
  * term's posting rows once (exact winner scores need them — a columnar
  * scan has no doc-ordered skip pointers), so the pruned path's saving
  * is the per-doc aggregation + sort population, not the scan; against
  * that it pays extra driver round-trips (per-term stats, candidate
  * threshold). The fixture stage is expected to land in noise; the
  * synthetic stage is where the trade must show.
  *
  *   BM25PRUNE query=<kind> terms=<n> dfs=<..> full=<s> pruned=<s> fired=<b> match=<b>
  *
  * Drive: Test/runMain graft.tools.Bm25PruneProbe [sfDir] [synthDocs]
  * (default sf0.1, 2000000).
  */
object Bm25PruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val synthDocs = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] = df
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    def time(f: => Seq[(Long, Long, Double)]): (Double, Seq[(Long, Long, Double)]) = {
      var out: Seq[(Long, Long, Double)] = Nil
      val reps = 3
      // warmup then best-of-reps
      out = f
      val best = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); out = f; (System.nanoTime() - t0) / 1e9
      }.min
      (best, out)
    }

    def drive(
        stage: String, docsPath: String, idx: String,
        queries: Seq[(String, Seq[String])], dfOf: Map[String, Long],
        cut: Double): Unit =
      for ((name, q) <- queries) {
        val (tFull, rFull) = time(rows(TextIndex.bm25Search(spark, docsPath, idx, q, 10)))
        val (tPruned, rPruned) = time(rows(
          TextIndex.bm25SearchPruned(spark, docsPath, idx, q, 10, commonDfFrac = cut)))
        println(f"BM25PRUNE stage=$stage query=$name terms=${q.size} " +
          f"dfs=${q.map(t => dfOf.getOrElse(t, 0L)).mkString("/")} " +
          f"full=$tFull%.3fs pruned=$tPruned%.3fs " +
          f"fired=${TextIndex.lastPruneFired} match=${rFull == rPruned}")
        require(rFull == rPruned, s"pruned path diverged on $stage/$name: $rPruned vs $rFull")
      }

    // ---- stage 1: the sf documents fixture --------------------------
    locally {
      val docsPath = s"$dir/documents.parquet"
      val idx = Files.createTempDirectory("bm25prune_idx").toString
      TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
      // term selection from the corpus itself, deterministic: the
      // highest-df term is the stop word; the selective terms are the
      // smallest dfs above a floor (>= 10 docs so queries are non-vacuous)
      val cur = graft.sources.Sidecar.current(spark, idx).get
      val live = spark.read.parquet(cur.liveDirs(idx): _*)
      val dfs = live
        .filter(col("term").isNotNull)
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val nDocs = live.filter(col("term").isNull).count()
      val common = dfs.maxBy { case (t, d) => (d, t) }._1
      val selBand = dfs.filter { case (_, d) => d >= 10 && d <= nDocs / 20 }
      val selectives = (if (selBand.nonEmpty) selBand
                        else dfs.filter { case (t, d) => d >= 2 && t != common })
        .sortBy { case (t, d) => (d, t) }
        .take(2).map(_._1).toSeq
      val dfOf = dfs.toMap
      println(s"BM25PRUNE stage=fixture nDocs=$nDocs common='$common'(df=${dfOf(common)}) " +
        s"selective=${selectives.map(t => s"'$t'(df=${dfOf(t)})").mkString(",")}")
      drive("fixture", docsPath, idx, Seq(
        ("selective-only", selectives.take(1)),
        ("mixed", selectives.take(1) :+ common),
        ("common-only", Seq(common))),
        dfOf, cut = 0.06) // the gate's cut: the fixture's 5%-df term stays selective
    }

    // ---- stage 2: synthetic — a common-only population worth skipping
    locally {
      val base = Files.createTempDirectory("bm25prune_synth").toString
      val docsPath = s"$base/docs"; val idx = s"$base/idx"
      // every doc: the stop word + 18 hash-spread filler words from a
      // 7919-word vocab; every 2000th doc also carries the needle
      val fillers = (0 until 18)
        .map(j => expr(s"concat('w', pmod(id * ${31 + j * 2} + $j, 7919))"))
      spark.range(synthDocs)
        .select(
          col("id").as("doc_id"),
          concat_ws(" ",
            lit("stop") +: when(pmod(col("id"), lit(2000)) === 0, lit("needle"))
              .otherwise(lit("pad")) +: fillers: _*).as("text"))
        .repartition(32)
        .write.parquet(docsPath)
      val t0 = System.nanoTime()
      TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
      println(f"BM25PRUNE stage=synth nDocs=$synthDocs needleDf=${synthDocs / 2000} " +
        f"build=${(System.nanoTime() - t0) / 1e9}%.1fs")
      val dfOf = Map("needle" -> synthDocs / 2000, "stop" -> synthDocs, "pad" -> synthDocs)
      drive("synth", docsPath, idx, Seq(
        ("selective-only", Seq("needle")),
        ("mixed", Seq("needle", "stop")),
        ("mixed-2common", Seq("needle", "stop", "pad")),
        ("common-only", Seq("stop"))),
        dfOf, cut = 0.05)
    }
    spark.stop()
  }
}
