package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump one query's result to `outDir/<name>`. A throwing query must
    * SURFACE, not vanish (round-7 lesson: 28 broken queries read as
    * "123 pass" because absence ≠ error in the driver's compare): on
    * failure the output dir is emptied and an `_error.txt` marker
    * written, so the driver's read of `<name>` fails loudly → recorded
    * as `err`, not missing. VerifyDumpSpec pins both paths. */
  private[graft] def dumpOne(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame
  ): Unit =
    try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      val d = new java.io.File(s"$outDir/$name")
      // Recursive, deepest-first: File.delete silently no-ops on non-empty
      // dirs, so a `_temporary` subdir from a mid-write failure would keep
      // committed part-files alive behind the marker — the driver could
      // glob them as a plausible result. VerifyDumpSpec pins this.
      deleteTree(d)
      d.mkdirs()
      Files.writeString(Paths.get(s"$outDir/$name/_error.txt"),
        s"${e.getClass.getName}: ${e.getMessage}\n")
    }

  private[graft] def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(): Unit
  }
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // GraftSession: the correctness gate must exercise the same session
    // config (extensions, AQE settings, broadcast threshold) users get.
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration escape hatch (driver leaves it unset): comma list
    // of query names to dump, e.g. SPARK_GRAFT_VERIFY_ONLY=text_redact.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) => dumpOne(spark, sfDir, outDir, name, fn) }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
