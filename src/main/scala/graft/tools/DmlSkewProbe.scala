package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement probe for the copy-on-write DML family under KEY-LAYOUT
  * SKEW (r16 — the r15 verdict's soak ask): the r15 SCALING numbers used
  * uniform keys, where a selective predicate's matches co-locate in few
  * files and hit-file pruning keeps cost O(affected bytes). The honest
  * failure mode is a layout whose files each contain the FULL key range
  * (ingest order uncorrelated with the key — the common case for a
  * streaming sink fed by arrival time): then EVERY file contains
  * matches, hit-file discovery returns the whole table, and the "row
  * surgery" degrades to a full rewrite no matter how selective the
  * predicate is.
  *
  * The probe builds the SAME rows under both layouts (key-clustered
  * ingest vs key-scattered ingest), runs a ~10%-of-keys DELETE, UPDATE,
  * and MERGE against each, and prints rewritten/total file counts plus
  * wall seconds — the numbers SCALING.md records. The fix for a
  * scattered table is layout maintenance, not DML cleverness: run
  * `GRAFT OPTIMIZE ... ZORDER BY`(or a sorted rewrite) so mutation keys
  * gain file locality, which the probe demonstrates by re-clustering
  * the scattered table and re-measuring.
  *
  * Usage: runMain graft.tools.DmlSkewProbe [rows] (default 400k rows,
  * 16 ingest batches). Output lines: `DMLSKEW layout=<l> op=<op>
  * rewritten=<n> total=<n> sec=<s>`.
  */
object DmlSkewProbe {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(400000L)
    val batches = 16
    val spark = graft.GraftSession.builder().getOrCreate()
    import spark.implicits._
    val root = s"/root/repo/tmp/graft_io/dml_skew_${rows}_${spark.sparkContext.applicationId}"

    val base = spark.range(rows).select(
      col("id"),
      (col("id") * 1.0).as("v"),
      pmod(col("id"), lit(1000L)).as("k"))

    /** Stream-ingest `base` into a manifest table, batch b holding either
      * a contiguous KEY slice (clustered) or a round-robin sample of the
      * full key range (scattered). */
    def build(layout: String, tag: String): String = {
      val src = s"$root/${layout}_${tag}_src"
      val tbl = s"$root/${layout}_${tag}_tbl"
      val ckpt = s"$root/${layout}_${tag}_ckpt"
      val slice =
        if (layout == "clustered") (base.col("id") * lit(batches) / lit(rows)).cast("int")
        else pmod(col("id"), lit(batches.toLong)).cast("int")
      base.withColumn("b", slice)
        .repartition(batches, col("b"))
        .write.mode(SaveMode.Overwrite).partitionBy("b").parquet(src)
      // one ingest batch per staged slice — each becomes >=1 table file
      val sch = spark.read.parquet(s"$src/b=0").schema
      val q = spark.readStream
        .schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$src/b=*")
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      tbl
    }

    def files(tbl: String): Int =
      graft.streaming.StreamSinks.committedFiles(spark, tbl, "parquet").size

    // ~10% of the ID space — clustered layout co-locates it in ~2/16
    // batches; scattered layout spreads it across every file
    val lo = (rows * 45) / 100
    val hi = (rows * 55) / 100

    // each op measures against a FRESH table of the same rows — a prior
    // op's rewrite would repack the layout and pollute the next number
    def measure(layout: String): Unit = {
      val dTbl = build(layout, "del")
      val (d, dSec) = timed(graft.streaming.Optimize.deleteWhere(
        spark, dTbl, col("id").between(lo, hi) && pmod(col("id"), lit(7L)) === 0L))
      println(f"DMLSKEW layout=$layout op=delete rewritten=${d.rewrittenFiles} " +
        f"total=${d.rewrittenFiles + d.keptFiles} sec=$dSec%.2f")
      val uTbl = build(layout, "upd")
      val (u, uSec) = timed(graft.streaming.Optimize.updateWhere(
        spark, uTbl, col("id").between(lo, hi) && pmod(col("id"), lit(7L)) === 1L,
        Map("v" -> lit(0.0))))
      println(f"DMLSKEW layout=$layout op=update rewritten=${u.rewrittenFiles} " +
        f"total=${u.rewrittenFiles + u.keptFiles} sec=$uSec%.2f")
      val mTbl = build(layout, "mrg")
      val srcMerge = spark.range(lo, hi, 13L).select(
        col("id"), lit(-1.0).as("v"), pmod(col("id"), lit(1000L)).as("k"))
      val (m, mSec) = timed(graft.streaming.Optimize.mergeInto(
        spark, mTbl, srcMerge, Seq("id")))
      println(f"DMLSKEW layout=$layout op=merge rewritten=${m.rewrittenFiles} " +
        f"total=${m.rewrittenFiles + m.keptFiles} sec=$mSec%.2f")
    }

    measure("clustered")
    measure("scattered")

    // layout maintenance rescues a scattered table: one Z-ORDER rewrite
    // on (id, k) restores id-locality (small targetFileBytes keeps a
    // multi-file layout at probe scale), and the SAME key-slice delete
    // goes back to touching a file subset
    val rescued = build("scattered", "rescue")
    val (_, zSec) = timed(graft.streaming.Optimize.optimizeSink(
      spark, rescued, "parquet", targetFileBytes = 128L * 1024,
      zOrderDims = Some(("id", "k"))))
    println(f"DMLSKEW layout=scattered op=zorder_rewrite total=${files(rescued)} sec=$zSec%.2f")
    val (d2, d2Sec) = timed(graft.streaming.Optimize.deleteWhere(
      spark, rescued, col("id").between(lo, hi) && pmod(col("id"), lit(7L)) === 0L))
    println(f"DMLSKEW layout=rescued op=delete rewritten=${d2.rewrittenFiles} " +
      f"total=${d2.rewrittenFiles + d2.keptFiles} sec=$d2Sec%.2f")

    // the SAME-key rescue (r16 SORT BY): when the mutation key IS the
    // cluster key, the 1-D sorted in-place rewrite drives the rewrite
    // fraction to O(slice width) — the guidance SCALING.md records
    val sorted = build("scattered", "sortrescue")
    val (_, sSec) = timed(graft.streaming.Optimize.optimizeSink(
      spark, sorted, "parquet", targetFileBytes = 128L * 1024, sortDims = Seq("id")))
    println(f"DMLSKEW layout=scattered op=sort_rewrite total=${files(sorted)} sec=$sSec%.2f")
    val (d3, d3Sec) = timed(graft.streaming.Optimize.deleteWhere(
      spark, sorted, col("id").between(lo, hi) && pmod(col("id"), lit(7L)) === 0L))
    println(f"DMLSKEW layout=sortrescued op=delete rewritten=${d3.rewrittenFiles} " +
      f"total=${d3.rewrittenFiles + d3.keptFiles} sec=$d3Sec%.2f")
    spark.stop()
  }
}
