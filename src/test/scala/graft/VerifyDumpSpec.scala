package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The correctness-dump contract: a succeeding query lands parquet; a
  * THROWING query leaves an emptied dir with an _error.txt marker so the
  * driver records `err` instead of silently skipping it (round-7's 28
  * invisible failures); a query that breaks AFTER a prior good dump
  * must not leave the stale good files behind the marker. */
class VerifyDumpSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(): String = {
    val p = Files.createTempDirectory("graft_verify")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("success dumps parquet; failure leaves only the _error.txt marker") {
    val s = spark
    import s.implicits._
    val out = freshDir()

    Verify.dumpOne(spark, "unused", out, "good",
      (sp, _) => { import sp.implicits._; Seq((1L, "a")).toDF("id", "x") })
    assert(spark.read.parquet(s"$out/good").count() === 1)
    assert(!new java.io.File(s"$out/good/_error.txt").exists())

    Verify.dumpOne(spark, "unused", out, "bad",
      (_, _) => throw new IllegalStateException("boom at construction"))
    val marker = new java.io.File(s"$out/bad/_error.txt")
    assert(marker.exists(), "failure must leave an _error.txt marker")
    assert(Files.readString(marker.toPath).contains("boom at construction"))
    // The marker dir must NOT read as a valid parquet result.
    intercept[Exception] { spark.read.parquet(s"$out/bad").collect() }
  }

  test("a failure AFTER a prior good dump does not leave stale results") {
    val s = spark
    import s.implicits._
    val out = freshDir()
    Verify.dumpOne(spark, "unused", out, "q",
      (sp, _) => { import sp.implicits._; Seq((1L, "a")).toDF("id", "x") })
    assert(spark.read.parquet(s"$out/q").count() === 1)

    // Re-dump the same name, now failing at ANALYSIS time (the NTZ
    // class of round 7): the old parquet must not survive as a
    // plausible-looking result.
    Verify.dumpOne(spark, "unused", out, "q",
      (sp, _) => sp.emptyDataFrame.select(org.apache.spark.sql.functions.col("nope")))
    assert(new java.io.File(s"$out/q/_error.txt").exists())
    intercept[Exception] { spark.read.parquet(s"$out/q").collect() }
  }

  test("failure cleanup removes nested subdirs (a _temporary tree), not just top-level files") {
    val out = freshDir()
    // Plant the debris of a mid-write crash: committed part-files inside a
    // _temporary subtree. A non-recursive delete no-ops on the non-empty dir
    // and the stale part-file would sit next to _error.txt.
    val tmp = new java.io.File(s"$out/q/_temporary/0/task_0")
    assert(tmp.mkdirs())
    Files.writeString(tmp.toPath.resolve("part-00000.parquet"), "stale")
    Files.writeString(Paths.get(s"$out/q/part-old.parquet"), "stale-top")

    Verify.dumpOne(spark, "unused", out, "q",
      (_, _) => throw new IllegalStateException("mid-write crash"))

    val left = new java.io.File(s"$out/q").listFiles().map(_.getName).toSet
    assert(left === Set("_error.txt"),
      s"failed query dir must hold ONLY the marker, found $left")
  }
}
