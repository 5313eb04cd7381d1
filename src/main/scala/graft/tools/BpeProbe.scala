package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Bpe

/** BPE production-depth rehearsal — the SCALING.md evidence that the
  * r15 trainer/apply twins hold at ≥1k merges:
  *
  *  - the fixture documents carry only 31 distinct [a-z]+ words (merges
  *    exhaust after ~150 rounds), so the rehearsal corpus suffixes each
  *    word with a 3-letter doc-derived syllable — a DETERMINISTIC
  *    expansion of the driver's own fixture (no synthetic data), giving
  *    a vocab in the tens of thousands: enough pair structure for well
  *    past 1k merges;
  *  - train cost is reported cumulatively at 125/250/500/1000 merges
  *    (each trained from scratch): LINEAR totals ⇔ flat per-round cost,
  *    the incremental-pair-maintenance claim;
  *  - the old per-round-Spark-job trainer is timed at 30 merges for the
  *    per-round unit cost the incremental loop retires;
  *  - apply is [[Bpe.tokenizeFast]] at the full 1k-merge stack over the
  *    expanded corpus (the replace-chain twin would codegen 1k nested
  *    calls per word — the hazard the fast path exists for), with
  *    chain-equality cross-checked at 64 merges on the same corpus.
  */
object BpeProbe {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      // deterministic vocab expansion: every [a-z]+ run gets a 3-letter
      // suffix derived from doc_id residues (19·17·13 combinations)
      val suffix = concat(
        char(lit(97) + pmod(col("doc_id"), lit(19))),
        char(lit(97) + pmod(col("doc_id"), lit(17))),
        char(lit(97) + pmod(col("doc_id"), lit(13))))
      val expanded = Tables.documents(spark, dir)
        .select(
          col("doc_id"),
          regexp_replace(col("text"), lit("([a-z]+)"), concat(lit("$1"), suffix)).as("text"))
        .localCheckpoint()
      val nDocs = expanded.count()
      val vocabN = expanded
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
        .distinct().count()
      println(s"BPEPROBE dir=$dir docs=$nDocs distinct_words=$vocabN")

      // (r16) the per-round-job trainer is retired to test scope — its
      // r15 unit costs stand in SCALING.md (~0.8 s/round at this width);
      // the probe measures the one production trainer at depth.

      // incremental trainer: cumulative totals at doubling depths
      var merges: Seq[String] = Seq.empty
      for (n <- Seq(125, 250, 500, 1000)) {
        val (m, t) = timed(Bpe.trainMergesFast(expanded, "text", n))
        merges = m
        println(f"BPEPROBE trainer=incremental merges=${m.size} (asked $n) total_s=$t%.1f " +
          f"per_round_ms=${t * 1000 / math.max(1, m.size)}%.2f")
      }

      // apply at full depth (fast path), plus a chain cross-check at 64
      val (cnt, tApply) = timed(
        Bpe.tokenizeFast(expanded, "doc_id", "text", merges)
          .agg(sum(col("n_bpe_tokens"))).head().getLong(0))
      println(f"BPEPROBE apply=fast merges=${merges.size} tokens=$cnt apply_s=$tApply%.1f")
      val m64 = merges.take(64)
      val h = (df: org.apache.spark.sql.DataFrame) =>
        df.agg(md5(concat_ws(",", collect_list(col("tokens_md5")))).as("h")).head().getString(0)
      val fast64 = h(Bpe.tokenizeFast(expanded, "doc_id", "text", m64).orderBy(col("doc_id")))
      val chain64 = h(Bpe.tokenizeChain(expanded, "doc_id", "text", m64).orderBy(col("doc_id")))
      println(s"BPEPROBE chain_equality_at_64=${fast64 == chain64}")
    }
    spark.stop()
  }
}
