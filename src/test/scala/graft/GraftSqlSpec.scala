package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamSinks

/** The GRAFT SQL statement family (parser extension): a SQL-only user
  * drives the full maintenance/DML lifecycle — UPDATE, DELETE, OPTIMIZE,
  * VACUUM, REPAIR — through `spark.sql`, with Spark's own expression
  * parser supplying WHERE/SET semantics and everything non-GRAFT falling
  * through to the stock grammar untouched.
  */
class GraftSqlSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** A 3-batch unpartitioned sink table holding (id 0..299, v = id). */
  private def buildTable(): String = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val out = freshDir("gsql_out")
    val ckpt = freshDir("gsql_ckpt")
    val stream = MemoryStream[(Long, Double)]
    Seq(0L, 100L, 200L).foreach { lo =>
      stream.addData((lo until lo + 100L).map(i => (i, i * 1.0)))
      val q = StreamSinks.parquetSink(stream.toDF().toDF("id", "v"), out, ckpt)
      q.processAllAvailable(); q.stop()
    }
    out
  }

  test("the full lifecycle drives through spark.sql") {
    val out = buildTable()

    // UPDATE with a multi-assignment SET whose second expression carries
    // a TOP-LEVEL-looking comma inside a call — the splitter must respect
    // nesting — and whose RHS reads a column the SET also writes: both
    // must evaluate against the OLD row
    val upd = spark.sql(
      s"GRAFT UPDATE '$out' SET v = -1.0, id = id + least(v, 1000.0) WHERE id < 5").collect()
    assert(upd.length == 1 && upd(0).getLong(0) >= 1)
    val t1 = spark.read.parquet(out)
    // old row (id=4, v=4.0): id becomes 4 + least(4.0,1000)=8, v becomes -1 —
    // proof the SET's id expression read the OLD v, not the assigned -1.0
    assert(t1.filter("id = 8").count() == 2, "expected remapped (4→8) plus untouched id=8")
    assert(t1.filter("id = 8 AND v = -1.0").count() == 1, "the remapped row carries v=-1")
    assert(t1.filter("v = -1.0").count() == 5, "five updated rows")
    assert(t1.count() == 300)

    // DELETE
    val del = spark.sql(s"GRAFT DELETE FROM '$out' WHERE id >= 290").collect()
    assert(del.length == 1 && del(0).getLong(0) >= 1)
    assert(spark.read.parquet(out).count() == 290)

    // OPTIMIZE — all remaining files compact to one
    val opt = spark.sql(s"GRAFT OPTIMIZE '$out'").collect()
    assert(opt(0).getLong(1) >= 1, "optimize produced no output files")
    assert(spark.read.parquet(out).count() == 290)

    // HISTORY lists one archived version per mutation (update, delete,
    // optimize), and they PIN the retired generations against VACUUM
    val hist = spark.sql(s"GRAFT HISTORY '$out'").collect()
    assert(hist.length == 3, s"expected 3 archived versions, got ${hist.length}")
    val protectedSweep = spark.sql(s"GRAFT VACUUM '$out' GRACE 0 MINUTES").collect()
    assert(protectedSweep.isEmpty,
      "vacuum swept history-protected generations — RESTORE would be impossible")

    // EXPIRE HISTORY releases them; VACUUM then reclaims every retired
    // generation
    val expired = spark.sql(s"GRAFT EXPIRE HISTORY '$out' KEEP 0").collect()
    assert(expired.length == 3)
    val swept = spark.sql(s"GRAFT VACUUM '$out' GRACE 0 MINUTES").collect()
    assert(swept.nonEmpty, "vacuum after update+delete+optimize found nothing to sweep")
    assert(spark.read.parquet(out).count() == 290)

    // REPAIR on a clean table reports clean
    assert(spark.sql(s"GRAFT REPAIR '$out'").collect()(0).getString(0) == "clean")
  }

  test("GRAFT RESTORE rolls the table back to an archived version through SQL") {
    val out = buildTable()
    spark.sql(s"GRAFT DELETE FROM '$out' WHERE id < 100").collect(): Unit
    assert(spark.read.parquet(out).count() == 200)

    val v = spark.sql(s"GRAFT HISTORY '$out'").collect().map(_.getLong(0)).max
    val rep = spark.sql(s"GRAFT RESTORE '$out' TO VERSION $v").collect()
    assert(rep(0).getLong(0) == v, "restored_version mismatch")
    assert(spark.read.parquet(out).count() == 300, "restore did not bring the deleted rows back")
    // the pre-restore state was archived — restore is undoable via SQL too
    val undoV = rep(0).getLong(2)
    spark.sql(s"GRAFT RESTORE '$out' TO VERSION $undoV").collect(): Unit
    assert(spark.read.parquet(out).count() == 200, "undoing the restore failed")
  }

  test("GRAFT MERGE WHEN MATCHED UPDATE SET drives a column-level, update-only merge") {
    val s = spark
    import s.implicits._
    val out = buildTable()

    // partial-column source: keys + a delta — WHEN NOT MATCHED IGNORE
    // makes it a pure update merge (155 matches, 900 is ignored)
    Seq((155L, 10.0), (900L, 99.0)).toDF("id", "delta")
      .createOrReplaceTempView("graft_sql_merge_cols_src")
    val rep = spark.sql(
      s"GRAFT MERGE INTO '$out' USING graft_sql_merge_cols_src ON (id) " +
        "WHEN MATCHED UPDATE SET v = t.v + s.delta WHEN NOT MATCHED IGNORE").collect()
    assert(rep(0).getLong(0) >= 1, "no matched file rewritten")
    val t = spark.read.parquet(out)
    assert(t.count() == 300, "IGNORE still inserted")
    assert(t.filter("id = 155 AND v = 165.0").count() == 1, "SET expression not applied")
    assert(t.filter("id = 900").count() == 0, "not-matched row inserted despite IGNORE")
  }

  test("GRAFT MERGE INTO upserts from a registered view; ZORDER optimize spelling works") {
    val s = spark
    import s.implicits._
    val out = buildTable()

    Seq((5L, -5.0), (400L, 400.0)).toDF("id", "v").createOrReplaceTempView("graft_sql_merge_src")
    val rep = spark.sql(
      s"GRAFT MERGE INTO '$out' USING graft_sql_merge_src ON (id)").collect()
    assert(rep(0).getLong(0) >= 1, "no matched file rewritten")
    val t = spark.read.parquet(out)
    assert(t.count() == 301, "one insert expected")
    assert(t.filter("id = 5 AND v = -5.0").count() == 1, "matched row not replaced")
    assert(t.filter("id = 400").count() == 1, "insert missing")

    // the ZORDER spelling of OPTIMIZE re-clusters in the same statement
    val opt = spark.sql(s"GRAFT OPTIMIZE '$out' ZORDER BY (id, v)").collect()
    assert(opt(0).getLong(1) >= 1, "z-ordered optimize produced no files")
    assert(spark.read.parquet(out).count() == 301)
  }

  test("GRAFT OPTIMIZE SORT BY re-clusters in place; ZORDER+SORT together refused") {
    val out = buildTable()
    val before = spark.read.parquet(out).count()
    val rep = spark.sql(s"GRAFT OPTIMIZE '$out' SORT BY (id)").collect()
    assert(rep(0).getLong(1) >= 1, "sorted optimize produced no files")
    assert(spark.read.parquet(out).count() == before, "sorted re-cluster changed the rows")
    // a re-clustering rewrites ALL files, large or small (the ZORDER rule)
    assert(rep(0).getLong(2) == 0, "SORT BY kept files out of the rewrite")
    val ex = intercept[Exception] {
      spark.sql(s"GRAFT OPTIMIZE '$out' ZORDER BY (id, v) SORT BY (id)").collect()
    }
    assert(ex.getMessage.contains("mutually exclusive"))
    // ONE z-order column parses (the grammar accepts it) and surfaces the
    // TARGETED dimensionality error, not "unrecognized GRAFT statement"
    val ex1 = intercept[Exception] {
      spark.sql(s"GRAFT OPTIMIZE '$out' ZORDER BY (id)").collect()
    }
    assert(ex1.getMessage.contains(">= 2 dimensions"), s"wrong error: ${ex1.getMessage}")
  }

  test("GRAFT MERGE ... WHEN NOT MATCHED BY SOURCE DELETE full-syncs through SQL") {
    val s = spark
    import s.implicits._
    val out = buildTable() // ids 0..299
    (0L until 100L).map(i => (i, -1.0)).toDF("id", "v")
      .createOrReplaceTempView("graft_sync_src")
    val rep = spark.sql(
      s"GRAFT MERGE INTO '$out' USING graft_sync_src ON (id) " +
        "WHEN NOT MATCHED BY SOURCE DELETE").collect()
    assert(rep(0).getLong(0) >= 1)
    val t = spark.read.parquet(out)
    assert(t.count() == 100, "SQL full sync must land the source row count")
    assert(t.filter("v = -1.0").count() == 100, "matched rows not replaced")
  }

  test("catalog-name GRAFT DML: register, DELETE by name, table read sees it, RESTORE by name") {
    val out = buildTable()
    val name = "graft_sql_byname"
    StreamSinks.registerTable(spark, name, out, "parquet", Nil)
    assert(spark.table(name).count() == 300)

    val rep = spark.sql(s"GRAFT DELETE FROM $name WHERE id < 100").collect()
    assert(rep(0).getLong(0) >= 1, "by-name delete rewrote no files")
    // the catalog read must serve the SWAPPED manifest — committed
    // survivors only, never live + retired generations together
    assert(spark.table(name).count() == 200, "spark.table did not see the by-name mutation")
    assert(spark.read.parquet(out).count() == 200, "path read disagrees with the name read")

    // HISTORY and RESTORE by the same name complete the lifecycle
    val v = spark.sql(s"GRAFT HISTORY $name").collect().map(_.getLong(0)).max
    spark.sql(s"GRAFT RESTORE $name TO VERSION $v").collect(): Unit
    assert(spark.table(name).count() == 300, "by-name restore did not surface")

    // unknown names and views are refused loudly
    val exU = intercept[Exception] {
      spark.sql("GRAFT DELETE FROM no_such_graft_table WHERE id < 1").collect()
    }
    assert(exU.getMessage.contains("unknown table"), exU.getMessage)
    spark.sql(s"CREATE OR REPLACE VIEW graft_byname_view AS SELECT * FROM $name")
    val exV = intercept[Exception] {
      spark.sql("GRAFT DELETE FROM graft_byname_view WHERE id < 1").collect()
    }
    assert(exV.getMessage.toLowerCase.contains("view"), exV.getMessage)

    // the quoted-path spelling stays green next to the name spelling
    spark.sql(s"GRAFT DELETE FROM '$out' WHERE id >= 250").collect(): Unit
    assert(spark.read.parquet(out).count() == 250)
  }

  test("GRAFT OPTIMIZE ... WHERE scopes the rewrite to the selected partitions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val out = freshDir("gsql_scope_out")
    val ckpt = freshDir("gsql_scope_ckpt")
    val stream = MemoryStream[(Long, String, Double)]
    Seq(0L, 100L).foreach { lo =>
      stream.addData((lo until lo + 100L).map(i =>
        (i, if (i % 2 == 0) "click" else "view", i * 1.0)))
      val q = StreamSinks.parquetSink(
        stream.toDF().toDF("id", "etype", "v"), out, ckpt, Seq("etype"))
      q.processAllAvailable(); q.stop()
    }
    def entries(part: String): Set[String] =
      StreamSinks.committedFiles(spark, out, "parquet").filter(_.contains(s"etype=$part")).toSet
    val viewBefore = entries("view")
    val rep = spark
      .sql(s"GRAFT OPTIMIZE '$out' SORT BY (id) WHERE etype = 'click'").collect()
    assert(rep(0).getLong(0) >= 2, "scoped rewrite covered no files")
    assert(rep(0).getLong(2) == viewBefore.size, "out-of-scope files not kept verbatim")
    assert(entries("view") == viewBefore, "the unselected partition changed")
    assert(entries("click").forall(_.contains("graft-compact-")))
    assert(spark.read.parquet(out).count() == 200)
    // a data-column scope predicate is refused loudly through SQL too
    val ex = intercept[Exception] {
      spark.sql(s"GRAFT OPTIMIZE '$out' WHERE v > 0").collect()
    }
    assert(ex.getMessage.contains("data column"), ex.getMessage)
    // WHERE on an unpartitioned table names the real problem
    val flat = buildTable()
    val exFlat = intercept[Exception] {
      spark.sql(s"GRAFT OPTIMIZE '$flat' WHERE id > 0").collect()
    }
    assert(exFlat.getMessage.contains("Hive-partitioned"), exFlat.getMessage)
  }

  test("graft_table_version TVF time-travels an archived generation; live table unchanged") {
    graft.functions.GraftExtensions.register(spark)
    val out = buildTable()
    spark.sql(s"GRAFT DELETE FROM '$out' WHERE id < 100").collect(): Unit
    assert(spark.read.parquet(out).count() == 200)
    val v = spark.sql(s"GRAFT HISTORY '$out'").collect().map(_.getLong(0)).max
    // the archived pre-delete generation serves THROUGH SQL...
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft_table_version('$out', $v)")
      .collect()(0).getLong(0) == 300, "time travel lost the archived rows")
    // ...without mutating the live table
    assert(spark.read.parquet(out).count() == 200, "time-travel read mutated the table")
    // expired version refuses loudly
    spark.sql(s"GRAFT EXPIRE HISTORY '$out' KEEP 0").collect(): Unit
    intercept[Exception] {
      spark.sql(s"SELECT COUNT(*) FROM graft_table_version('$out', $v)").collect()
    }
  }

  test("GRAFT OPTIMIZE TARGET n MB sizes the rewrite's output files") {
    val out = buildTable()
    // 1 MB target on a tiny table → one output file; the clause parses
    // and reaches optimizeSink (a bad spelling still fails loudly)
    val rep = spark.sql(s"GRAFT OPTIMIZE '$out' SORT BY (id) TARGET 1 MB").collect()
    assert(rep(0).getLong(1) == 1, s"expected one ~1MB output file, got ${rep(0).getLong(1)}")
    assert(spark.read.parquet(out).count() == 300)
    intercept[Exception] { spark.sql(s"GRAFT OPTIMIZE '$out' TARGET MB") }
  }

  test("UPDATE's SET/WHERE split respects parens and string literals") {
    val out = buildTable()
    // a quoted ' WHERE ' inside a SET expression must NOT split the
    // statement; the real WHERE is the top-level one
    val rep = spark.sql(
      s"GRAFT UPDATE '$out' SET v = CASE WHEN 'no where here' = 'x' THEN v ELSE -7.0 END " +
        "WHERE id < 2").collect()
    assert(rep(0).getLong(0) >= 1)
    val t = spark.read.parquet(out)
    assert(t.filter("v = -7.0").count() == 2, "quoted WHERE broke the SET/WHERE split")
    assert(t.count() == 300)
    // missing top-level WHERE fails loudly
    intercept[Exception] {
      spark.sql(s"GRAFT UPDATE '$out' SET v = 0.0")
    }
  }

  test("non-GRAFT SQL falls through; malformed GRAFT fails loudly") {
    assert(spark.sql("SELECT 1 + 1 AS x").collect()(0).getInt(0) == 2)
    val ex = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("GRAFT FROBNICATE 'nowhere'")
    }
    assert(ex.getMessage.contains("GRAFT"))
  }
}
