package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** The deterministic BPE tokenizer (`operators/Bpe`): merge training is
  * invariant to partitioning (the oracle-parity precondition), ties break
  * on the pattern string, and the cell-encoded `replace` application is
  * exactly the greedy left-to-right non-overlapping merge. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("merge training is deterministic across partitionings") {
    val d = docs(
      1L -> "lower lower power tower flower",
      2L -> "slow slower slowest low lowest",
      3L -> "power flower tower glow")
    val m1 = BpeReferenceTrainer.trainMerges(d.repartition(1), "text", 10)
    val m7 = BpeReferenceTrainer.trainMerges(d.repartition(7), "text", 10)
    assert(m1 === m7, "merge sequence changed under repartitioning")
    assert(m1.nonEmpty && m1.size === 10)
  }

  test("tie-break: equal-count pairs choose the lexicographically smaller pattern") {
    // 'zq' and 'ab' both appear exactly 3 times as adjacent pairs; the
    // first merge must be the smaller pattern '|a|b'
    val d = docs(1L -> "ab ab ab zq zq zq")
    val m = BpeReferenceTrainer.trainMerges(d, "text", 1)
    assert(m === Seq("|a|b"))
  }

  test("greedy left-to-right non-overlap: 'aaa' merging (a,a) gives [aa, a]") {
    // the '|a|a|a' replace case the cell encoding exists for: one merge
    // of the (a,a) pair must produce tokens [aa, a], never [a, aa] or
    // a double-merge
    val merged = Bpe
      .tokenize(docs(1L -> "aaa"), "doc_id", "text", Seq("|a|a"))
      .select(col("tokens_str"))
      .head()
      .getString(0)
    assert(merged === "|aa|a", s"got '$merged'")
  }

  // ------------- production-scale twins (r15): incremental trainer + cursor apply -------------

  private def tokensBy(
      f: (org.apache.spark.sql.DataFrame, String, String, Seq[String]) => org.apache.spark.sql.DataFrame,
      d: org.apache.spark.sql.DataFrame,
      merges: Seq[String]): Map[Long, String] =
    f(d, "doc_id", "text", merges)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("tokens_str"))
      .toMap

  test("trainMergesFast ≡ the reference per-round trainer merge-for-merge (fixture + ties + overlap + exhaustion)") {
    val fixtures = Seq(
      docs(1L -> "ab ab ab zq zq zq"),                       // the tie case
      docs(1L -> "aaa aaaa aa"),                             // overlap ranking + greedy update
      docs(1L -> "lower lower power tower flower",
           2L -> "slow slower slowest low lowest",
           3L -> "power flower tower glow"),
      docs(1L -> "ab", 2L -> "ba"),                          // exhaustion well before nMerges
      Tables.documents(spark, "/root/testdata/sf0.001"))
    fixtures.foreach { d =>
      val slow = BpeReferenceTrainer.trainMerges(d, "text", 30)
      val fast = Bpe.trainMergesFast(d, "text", 30)
      assert(fast === slow, "incremental trainer diverged from the reference per-round trainer")
    }
  }

  test("tokenizeFast ≡ the replace chain token-for-token (incl. trained fixture merges)") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainMergesFast(d, "text", 30)
    assert(tokensBy(Bpe.tokenizeFast, d, merges) === tokensBy(Bpe.tokenizeChain, d, merges))
    // crafted: overlap, rank order, empty doc, duplicate-pattern stack
    val crafted = docs(1L -> "aaa abab", 2L -> "", 3L -> "banana bandana")
    for (m <- Seq(
        Seq("|a|a"),
        Seq("|a|b", "|ab|a"),
        Seq("|a|n", "|b|an", "|ban|an", "|a|n"), // duplicate pattern: chain applies BOTH ranks
        Bpe.trainMergesFast(crafted, "text", 12))) {
      assert(tokensBy(Bpe.tokenizeFast, crafted, m) === tokensBy(Bpe.tokenizeChain, crafted, m),
        s"cursor apply diverged from the replace chain on merges $m")
    }
  }

  test("tokenizeFast ≡ chain on seeded pseudo-random corpora with trained merges") {
    // deterministic LCG corpora — ANN-style worst-case soup of short
    // repetitive words, where overlap/duplicate-pattern edge cases breed
    var s = 12345L
    def nxt(): Int = { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 33).toInt }
    val alpha = "abc"
    val d = docs((1L to 40L).map { id =>
      val words = (0 until 8).map { _ =>
        val len = 1 + math.floorMod(nxt(), 6)
        (0 until len).map(_ => alpha(math.floorMod(nxt(), alpha.length))).mkString
      }
      id -> words.mkString(" ")
    }: _*)
    val merges = Bpe.trainMergesFast(d, "text", 40)
    assert(merges.nonEmpty)
    assert(merges === BpeReferenceTrainer.trainMerges(d, "text", 40))
    assert(tokensBy(Bpe.tokenizeFast, d, merges) === tokensBy(Bpe.tokenizeChain, d, merges))
  }

  test("deep merge stacks dispatch to tokenizeFast and stay consistent") {
    // > ReplaceChainMaxMerges merges: tokenize() must route to the
    // mapPartitions twin (the chain would codegen 1k nested replaces);
    // consistency is pinned against the chain on the same merges
    val d = docs(1L -> "interrelated internationalization interoperability",
                 2L -> "internal international intern relation rationalization")
    val merges = Bpe.trainMergesFast(d, "text", 100) // exhausts below 100 — still > threshold? guard:
    val deep = if (merges.size > Bpe.ReplaceChainMaxMerges) merges
               else merges ++ Seq.fill(Bpe.ReplaceChainMaxMerges + 1 - merges.size)("|q|q")
    assert(tokensBy((dd, i, t, m) => Bpe.tokenize(dd, i, t, m), d, deep) ===
      tokensBy(Bpe.tokenizeChain, d, deep))
  }

  test("TVF training cache keys on CONTENTS, not view name: re-registering retrains") {
    graft.functions.GraftExtensions.register(spark)
    def toks(view: String): Seq[Long] =
      spark.sql(s"SELECT n_bpe_tokens FROM graft_bpe_tokenize('$view', 'doc_id', 'text', 1) " +
          "ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
    // corpus A trains merge |a|b under this name…
    docs(1L -> "ab ab ab").createOrReplaceTempView("graft_bpe_stale_t")
    assert(toks("graft_bpe_stale_t") === Seq(3L)) // three 1-token words
    // …then corpus B replaces it UNDER THE SAME NAME: pre-fix the
    // name-keyed cache served A's merges (|a|b does nothing to "zq" →
    // 6 tokens); content-keyed, B retrains |z|q and gets 3
    docs(1L -> "zq zq zq").createOrReplaceTempView("graft_bpe_stale_t")
    val stale = toks("graft_bpe_stale_t")
    docs(1L -> "zq zq zq").createOrReplaceTempView("graft_bpe_stale_fresh")
    assert(stale === toks("graft_bpe_stale_fresh"),
      "same-name re-registration served the FIRST corpus' merges — stale tokenization")
    assert(stale === Seq(3L))
  }

  test("BPE model round-trips through saveBpeModel/loadBpeModel (tokenize parity)") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainMergesFast(d, "text", 30)
    val fp = Bpe.contentFingerprint(d)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_model").toString
    val m = Bpe.BpeModel(merges, "text", 30, 1L, fp)
    Bpe.saveBpeModel(spark, m, s"$dir/model")
    val loaded = Bpe.loadBpeModel(spark, s"$dir/model")
    assert(loaded === m, "model did not round-trip bit-exactly")
    // the loaded merges tokenize identically — the whole point of persistence
    assert(tokensBy(Bpe.tokenizeChain, d, loaded.merges) === tokensBy(Bpe.tokenizeChain, d, merges))
  }

  test("trainOrLoadMerges: serves a FRESH model without retraining; stale fingerprint retrains") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_tol").toString
    val path = s"$dir/model"
    val before = Bpe.trainInvocations.get()
    val m1 = Bpe.trainOrLoadMerges(d, "text", 30, path)
    assert(Bpe.trainInvocations.get() == before + 1, "first call must train")
    // a 'restarted application' (no in-JVM state involved here) SERVES
    val m2 = Bpe.trainOrLoadMerges(d, "text", 30, path)
    assert(m2 === m1)
    assert(Bpe.trainInvocations.get() == before + 1, "a fresh persisted model must serve, not retrain")
    // different params → the stored model is NOT this tokenizer: retrain
    Bpe.trainOrLoadMerges(d, "text", 10, path): Unit
    assert(Bpe.trainInvocations.get() == before + 2, "param mismatch must retrain")
    // different corpus (fingerprint mismatch) → retrain + overwrite
    import spark.implicits._
    val other = Seq((1L, "zq zq zq ab ab")).toDF("doc_id", "text")
    val m3 = Bpe.trainOrLoadMerges(other, "text", 10, path)
    assert(Bpe.trainInvocations.get() == before + 3, "fingerprint mismatch must retrain")
    assert(m3 === Bpe.trainMergesFast(other, "text", 10))
  }

  test("TVF serves the persisted model across a simulated restart (modelDir conf)") {
    graft.functions.GraftExtensions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_store").toString
    val confKey = "spark.graft.bpe.modelDir"
    spark.conf.set(confKey, dir)
    try {
      docs(1L -> "banana bandana cabana").createOrReplaceTempView("graft_bpe_persist_t")
      def run(): Seq[(Long, Long, String)] =
        spark.sql("SELECT doc_id, n_bpe_tokens, tokens_md5 FROM " +
            "graft_bpe_tokenize('graft_bpe_persist_t', 'doc_id', 'text', 8) ORDER BY doc_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      val first = run()
      val trained = Bpe.trainInvocations.get()
      // simulated restart: the in-JVM cache dies with the JVM — clear it;
      // the TVF must SERVE the persisted model, not retrain
      Bpe.clearMergeCacheForTest()
      assert(run() === first, "restart changed the tokenization")
      assert(Bpe.trainInvocations.get() == trained,
        "the TVF retrained after a restart despite a fresh persisted model")
    } finally spark.conf.unset(confKey)
  }

  test("tokenize counts cells exactly and hashes the full token string") {
    val r = Bpe
      .tokenize(docs(1L -> "line line", 2L -> ""), "doc_id", "text", Seq("|l|i", "|li|n", "|lin|e"))
      .collect()
      .map(x => x.getAs[Long]("doc_id") -> ((x.getAs[Long]("n_bpe_tokens"), x.getAs[String]("tokens_str"))))
      .toMap
    assert(r(1L) === ((2L, "|line |line")))
    assert(r(2L) === ((0L, ""))) // wordless doc: zero tokens, stable hash
  }

  test("rank order matters: later merges see earlier merges' symbols") {
    // '|li|n' can only fire after '|l|i' created the 'li' symbol
    val afterFirst = Bpe.tokenize(docs(1L -> "lin"), "doc_id", "text", Seq("|l|i"))
      .head().getAs[String]("tokens_str")
    assert(afterFirst === "|li|n")
    val afterBoth = Bpe.tokenize(docs(1L -> "lin"), "doc_id", "text", Seq("|l|i", "|li|n"))
      .head().getAs[String]("tokens_str")
    assert(afterBoth === "|lin")
  }
}
