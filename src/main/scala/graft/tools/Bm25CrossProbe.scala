package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextIndex

/** Measures the BM25 serving crossover (r17, the r14 phrase-crossover
  * recipe applied to RANKED retrieval): `bm25Search` through the
  * persisted postings index (term-pruned tf legs + embedded doc
  * lengths) vs the same Robertson scoring computed from a RAW-TEXT
  * re-explode per query (no index — every document tokenized every
  * query). Fixture matches r14's real-text regime: 10k-word vocabulary,
  * 200-word docs, the query terms planted every ~200th doc, index
  * pre-built (amortized — its one-time cost is reported honestly).
  *
  *   BM25X m=<m> docs=<n> buildMs=<b> indexedMs=<i> rawMs=<r>
  *
  * Expectation at scale: the indexed path is corpus-size-independent
  * (its scans read only the query terms' posting rows); the raw path
  * grows linearly with text bytes. Below the crossover the honest
  * negative stands — a cache-resident corpus re-explode beats the
  * multi-stage indexed plan's fixed overhead.
  *
  * Drive: Test/runMain graft.tools.Bm25CrossProbe [m ...] (default
  * 10 50 200 — 50k/250k/1M docs).
  */
object Bm25CrossProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ms = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(10, 50, 200)
    val terms = Seq("w17", "w23")
    val scratch = Files.createTempDirectory("bm25x").toString

    // the RAW baseline: identical Robertson/quantization formula, but
    // every query re-tokenizes the whole corpus (the pre-index shape)
    def bm25Raw(docs: DataFrame, k: Int): DataFrame = {
      val k1 = 1.2; val b = 0.75
      val st = docs
        .agg(count(lit(1)).as("n"),
          sum(size(split(col("text"), " ")).cast("double")).as("total"))
        .collect()(0)
      val nDocs = st.getLong(0)
      val avgdl = st.getDouble(1) / nDocs
      val tok = docs.select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      val tf = tok
        .filter(col("term").isin(terms: _*))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val idfQ = floor(
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          lit(1000000.0) + lit(0.5)) / lit(1000000.0)
      val contrib = floor(
        col("idf_q") * (col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))) *
          lit(1000000.0) + lit(0.5)).cast("long")
      tf.join(broadcast(dfq.withColumn("idf_q", idfQ).select(col("term"), col("idf_q"))),
          Seq("term"))
        .withColumn("c", contrib)
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("s"))
        .orderBy(col("s").desc, col("doc_id").asc)
        .limit(k)
    }

    for (m <- ms) {
      val docsPath = s"$scratch/docs_$m"
      spark.range(5000L * m).select(
        col("id").as("doc_id"),
        concat(
          array_join(
            transform(
              sequence(lit(1), lit(200)),
              i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(10000)))),
            " "),
          when(pmod(col("id"), lit(200)) === 0, lit(" w17 w23")).otherwise(lit("")))
          .as("text"))
        .write.mode(SaveMode.Overwrite).parquet(docsPath)
      val docs = spark.read.parquet(docsPath)
      val nDocs = docs.count()
      val idx = s"$scratch/idx_$m"
      val tb0 = System.nanoTime()
      TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
      val buildMs = (System.nanoTime() - tb0) / 1000000

      def timeWarm(f: => Array[org.apache.spark.sql.Row]): (Long, Array[org.apache.spark.sql.Row]) = {
        f // warm
        val t0 = System.nanoTime()
        val r1 = f
        val r2 = f
        require(r1.length == r2.length)
        ((System.nanoTime() - t0) / 2000000, r1)
      }
      val (idxMs, idxTop) = timeWarm(
        TextIndex.bm25Search(spark, docsPath, idx, terms, 20).collect())
      val (rawMs, rawTop) = timeWarm(bm25Raw(docs, 20).collect())
      // sanity: both paths rank the same documents
      val a = idxTop.map(_.getAs[Long]("doc_id")).toSet
      val bSet = rawTop.map(_.getAs[Long]("doc_id")).toSet
      require(a == bSet, s"m=$m: indexed and raw BM25 disagree (${a.size} vs ${bSet.size})")
      println(s"BM25X m=$m docs=$nDocs buildMs=$buildMs indexedMs=$idxMs rawMs=$rawMs")
    }
    spark.stop()
  }
}
