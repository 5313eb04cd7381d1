package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** SQL spellings for the table-maintenance/DML family — a PARSER
  * extension (SparkSessionExtensions.injectParser), the same seam Delta
  * uses for OPTIMIZE/VACUUM: statements Spark's grammar doesn't know are
  * intercepted BEFORE the delegate parser, everything else passes
  * through untouched.
  *
  * Grammar (table references are single-quoted PATH literals or unquoted
  * catalog NAMES — a name resolves via the session catalog to the
  * registered external table's location, the reference's query-by-NAME
  * guarantee extended to mutations, and the catalog relation refreshes
  * after a by-name mutation so `spark.table(name)` serves the swapped
  * manifest immediately; case-insensitive keywords; WHERE/SET
  * expressions parsed by Spark's OWN expression parser, so the full SQL
  * expression language applies):
  *
  *   GRAFT OPTIMIZE '<path>' [FORMAT '<fmt>'] [ZORDER BY (a, b[, c...])] [SORT BY (a[, b...])]
  *     [TARGET <n> MB] [WHERE <partition predicate>]
  *   GRAFT DELETE FROM '<path>' [FORMAT '<fmt>'] WHERE <expr>
  *   GRAFT UPDATE '<path>' [FORMAT '<fmt>'] SET c1 = <expr>[, ...] WHERE <expr>
  *   GRAFT MERGE INTO '<path>' [FORMAT '<fmt>'] USING <viewName> ON (k1[, k2...])
  *     [WHEN MATCHED UPDATE SET c1 = <expr>[, ...]] [WHEN NOT MATCHED IGNORE]
  *     [WHEN NOT MATCHED BY SOURCE DELETE]
  *   GRAFT VACUUM '<path>' [FORMAT '<fmt>'] [GRACE <n> MINUTES]
  *   GRAFT REPAIR '<path>'
  *   GRAFT HISTORY '<path>'
  *   GRAFT RESTORE '<path>' [FORMAT '<fmt>'] TO VERSION <n>
  *   GRAFT EXPIRE HISTORY '<path>' KEEP <n>
  *
  * MERGE's `WHEN MATCHED UPDATE SET` makes the merge COLUMN-LEVEL (the
  * source may carry a column subset; expressions address the table row
  * as `t` and the source row as `s`); `WHEN NOT MATCHED IGNORE` skips
  * inserts (update-only merge). Without either clause MERGE is the
  * whole-row upsert.
  *
  * Each returns its report as rows (the command pattern: metadata-scale
  * output on the driver). A SQL-only user gets the full
  * optimize/delete/update/vacuum/repair lifecycle without touching the
  * Scala API.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parse(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // Every statement's table reference is a quoted PATH ('…') or an
  // unquoted catalog NAME ([db.]table) — the reference's query-by-NAME
  // guarantee (README.md:13,17) extended to mutations: names resolve via
  // the session catalog to the registered external table's location
  // (StreamSinks.registerTable) at run() time. Two capture groups per
  // reference: (path, name), exactly one non-null.
  private val Ref = """(?:'([^']+)'|([A-Za-z_][\w.]*))"""
  private val Optimize =
    // ZORDER BY accepts ONE-or-more columns so a single-dimension z-order
    // reaches zOrderedN's targeted "needs >= 2 dimensions" require instead
    // of falling through to the generic unrecognized-statement error
    ("""(?is)\s*GRAFT\s+OPTIMIZE\s+""" + Ref + """(?:\s+FORMAT\s+'([^']+)')?(?:\s+ZORDER\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?(?:\s+SORT\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\))?(?:\s+TARGET\s+(\d+)\s+MB)?(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r
  private val Delete =
    ("""(?is)\s*GRAFT\s+DELETE\s+FROM\s+""" + Ref + """(?:\s+FORMAT\s+'([^']+)')?\s+WHERE\s+(.+?)\s*;?\s*""").r
  private val Update =
    ("""(?is)\s*GRAFT\s+UPDATE\s+""" + Ref + """(?:\s+FORMAT\s+'([^']+)')?\s+SET\s+(.+?)\s*;?\s*""").r
  private val Vacuum =
    ("""(?is)\s*GRAFT\s+VACUUM\s+""" + Ref + """(?:\s+FORMAT\s+'([^']+)')?(?:\s+GRACE\s+(\d+)\s+MINUTES)?\s*;?\s*""").r
  private val Repair =
    ("""(?is)\s*GRAFT\s+REPAIR\s+""" + Ref + """\s*;?\s*""").r
  private val Merge =
    ("""(?is)\s*GRAFT\s+MERGE\s+INTO\s+""" + Ref + """(?:\s+FORMAT\s+'([^']+)')?\s+USING\s+([\w.]+)\s+ON\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)(?:\s+WHEN\s+MATCHED\s+UPDATE\s+SET\s+(.+?))?(\s+WHEN\s+NOT\s+MATCHED\s+IGNORE)?(\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+DELETE)?\s*;?\s*""").r
  private val History =
    ("""(?is)\s*GRAFT\s+HISTORY\s+""" + Ref + """\s*;?\s*""").r
  private val Restore =
    ("""(?is)\s*GRAFT\s+RESTORE\s+""" + Ref + """(?:\s+FORMAT\s+'([^']+)')?\s+TO\s+VERSION\s+(\d+)\s*;?\s*""").r
  private val ExpireHistory =
    ("""(?is)\s*GRAFT\s+EXPIRE\s+HISTORY\s+""" + Ref + """\s+KEEP\s+(\d+)\s*;?\s*""").r

  /** Resolve a statement's table reference to a filesystem location:
    * quoted paths pass through; catalog names dereference to the
    * registered table's location. Loud on unknown names and on views
    * (a view has no location to mutate). */
  private[plans] def loc(spark: SparkSession, ref: String, byName: Boolean): String =
    if (!byName) ref
    else {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(ref)
      val catalog = spark.sessionState.catalog
      // tableExists consults the EXTERNAL catalog only, so a temp view
      // name lands on the unknown-table error — correct: a view has no
      // storage location to mutate
      require(catalog.tableExists(ident),
        s"GRAFT: unknown table '$ref' — register the sink directory first " +
          "(StreamSinks.registerTable) or pass a quoted '<path>'")
      val meta = catalog.getTableMetadata(ident)
      require(meta.tableType != org.apache.spark.sql.catalyst.catalog.CatalogTableType.VIEW,
        s"GRAFT: '$ref' is a view — GRAFT DML mutates STORAGE; name a registered " +
          "external table or pass a quoted '<path>'")
      new org.apache.hadoop.fs.Path(meta.location).toString
    }

  /** After a by-name mutation, drop the catalog's cached relation/file
    * listing so `spark.table(name)` immediately serves the swapped
    * manifest. */
  private[plans] def refreshIfNamed(spark: SparkSession, ref: String, byName: Boolean): Unit =
    if (byName) spark.catalog.refreshTable(ref)

  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case Optimize(path, name, fmt, z, s, tgt, where) =>
        val zDims = Option(z).map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)
        val sDims = Option(s).map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)
        Option(where).foreach(delegate.parseExpression(_): Unit) // syntax-check at parse time
        Some(GraftOptimizeCommand(Option(path).getOrElse(name),
          Option(fmt).getOrElse("parquet"), zDims, sDims,
          Option(tgt).map(_.toLong * 1024 * 1024), Option(where), byName = path == null))
      case Delete(path, name, fmt, where) =>
        delegate.parseExpression(where) // syntax-check NOW: parse errors surface at parse time
        Some(GraftDeleteCommand(Option(path).getOrElse(name),
          Option(fmt).getOrElse("parquet"), where, byName = path == null))
      case Update(path, name, fmt, rest) =>
        // the SET list and the statement's own WHERE split at the first
        // TOP-LEVEL `WHERE` token — a WHERE inside a subquery's parens or
        // a string literal belongs to its SET expression
        val (setList, where) = splitTopLevelWhere(rest).getOrElse(
          throw new IllegalArgumentException(
            s"GRAFT UPDATE: missing top-level WHERE clause in: $rest"))
        val assigns = splitAssignments(setList)
        assigns.foreach { case (_, e) => delegate.parseExpression(e) }
        delegate.parseExpression(where)
        Some(GraftUpdateCommand(Option(path).getOrElse(name),
          Option(fmt).getOrElse("parquet"), assigns, where, byName = path == null))
      case Vacuum(path, name, fmt, grace) =>
        Some(GraftVacuumCommand(Option(path).getOrElse(name),
          Option(fmt).getOrElse("parquet"),
          Option(grace).map(_.toLong * 60000L).getOrElse(10 * 60 * 1000L),
          byName = path == null))
      case Repair(path, name) =>
        Some(GraftRepairCommand(Option(path).getOrElse(name), byName = path == null))
      case Merge(path, name, fmt, view, keys, matchedSet, noInsert, syncDelete) =>
        val assigns = Option(matchedSet).map(splitAssignments).getOrElse(Nil)
        assigns.foreach { case (_, e) => delegate.parseExpression(e) }
        Some(GraftMergeCommand(Option(path).getOrElse(name),
          Option(fmt).getOrElse("parquet"), view,
          keys.split(',').map(_.trim).toSeq, assigns,
          insertNotMatched = Option(noInsert).isEmpty,
          deleteNotMatchedBySource = Option(syncDelete).nonEmpty, byName = path == null))
      case History(path, name) =>
        Some(GraftHistoryCommand(Option(path).getOrElse(name), byName = path == null))
      case Restore(path, name, fmt, version) =>
        Some(GraftRestoreCommand(Option(path).getOrElse(name),
          Option(fmt).getOrElse("parquet"), version.toLong, byName = path == null))
      case ExpireHistory(path, name, keep) =>
        Some(GraftExpireHistoryCommand(Option(path).getOrElse(name), keep.toInt,
          byName = path == null))
      case t if t.trim.toUpperCase.startsWith("GRAFT ") =>
        throw new ParseException(
          command = Some(t),
          start = org.apache.spark.sql.catalyst.trees.Origin(),
          errorClass = "PARSE_SYNTAX_ERROR",
          messageParameters = Map(
            "error" -> s"unrecognized GRAFT statement: ${t.trim.take(80)}",
            "hint" -> (" (expected OPTIMIZE / DELETE FROM / UPDATE / MERGE INTO / VACUUM / " +
              "REPAIR / HISTORY / RESTORE / EXPIRE HISTORY)")))
      case _ => None
    }

  /** First TOP-LEVEL `WHERE` keyword (depth 0, outside quotes, word-
    * bounded, case-insensitive) splits `<set list> WHERE <predicate>`. */
  private[plans] def splitTopLevelWhere(s: String): Option[(String, String)] = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (quote != 0) { if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' => quote = ch
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case 'w' | 'W' if depth == 0 &&
            i + 5 <= s.length && s.substring(i, i + 5).equalsIgnoreCase("where") &&
            (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) && s.charAt(i - 1) != '_') &&
            (i + 5 == s.length || !Character.isLetterOrDigit(s.charAt(i + 5)) && s.charAt(i + 5) != '_') =>
          return Some((s.substring(0, i).trim, s.substring(i + 5).trim))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Split `c1 = e1, c2 = e2` on TOP-LEVEL commas only (commas inside
    * parens/quotes belong to the expressions). Expression TEXT is kept —
    * the analyzer reflects over a command's Expression fields and would
    * try to resolve them against the childless command node, so the
    * commands carry SQL strings and re-parse at run() time. */
  private[plans] def splitAssignments(s: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"'        => quote = ch; cur += ch
        case '(' | '['         => depth += 1; cur += ch
        case ')' | ']'         => depth -= 1; cur += ch
        case ',' if depth == 0 => parts += cur.result(); cur.clear()
        case _                 => cur += ch
      }
    }
    if (cur.nonEmpty) parts += cur.result()
    parts.toSeq.map { p =>
      val i = p.indexOf('=')
      require(i > 0, s"GRAFT UPDATE: bad assignment '$p' (expected col = expr)")
      (p.substring(0, i).trim, p.substring(i + 1).trim)
    }
  }
}

private object GraftCommandOutput {
  def report: Seq[Attribute] = Seq(
    AttributeReference("rewritten_files", LongType, nullable = false)(),
    AttributeReference("output_files", LongType, nullable = false)(),
    AttributeReference("kept_files", LongType, nullable = false)(),
    AttributeReference("latest_batch_id", LongType, nullable = false)())
}

case class GraftOptimizeCommand(
    path: String, format: String, zOrderDims: Seq[String], sortDims: Seq[String],
    targetFileBytes: Option[Long] = None, whereSql: Option[String] = None,
    byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.report
  override def run(spark: SparkSession): Seq[Row] = {
    val r = graft.streaming.Optimize.optimizeSink(
      spark, GraftSqlParser.loc(spark, path, byName), format,
      targetFileBytes = targetFileBytes.getOrElse(128L * 1024 * 1024),
      zOrderDimsN = zOrderDims, sortDims = sortDims,
      partitionWhere = whereSql.map(org.apache.spark.sql.functions.expr))
    GraftSqlParser.refreshIfNamed(spark, path, byName)
    Seq(Row(r.compactedFiles.toLong, r.outputFiles.toLong, r.keptFiles.toLong, r.latestBatchId))
  }
}

case class GraftDeleteCommand(
    path: String, format: String, whereSql: String, byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.report
  override def run(spark: SparkSession): Seq[Row] = {
    val r = graft.streaming.Optimize.deleteWhere(
      spark, GraftSqlParser.loc(spark, path, byName),
      org.apache.spark.sql.functions.expr(whereSql), format)
    GraftSqlParser.refreshIfNamed(spark, path, byName)
    Seq(Row(r.rewrittenFiles.toLong, r.outputFiles.toLong, r.keptFiles.toLong, r.latestBatchId))
  }
}

case class GraftUpdateCommand(
    path: String, format: String, set: Seq[(String, String)], whereSql: String,
    byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.report
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.expr
    val r = graft.streaming.Optimize.updateWhere(
      spark, GraftSqlParser.loc(spark, path, byName), expr(whereSql),
      set.map { case (c, e) => c -> expr(e) }.toMap, format)
    GraftSqlParser.refreshIfNamed(spark, path, byName)
    Seq(Row(r.rewrittenFiles.toLong, r.outputFiles.toLong, r.keptFiles.toLong, r.latestBatchId))
  }
}

case class GraftMergeCommand(
    path: String, format: String, sourceView: String, keyCols: Seq[String],
    matchedSet: Seq[(String, String)] = Nil, insertNotMatched: Boolean = true,
    deleteNotMatchedBySource: Boolean = false, byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftCommandOutput.report
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.expr
    val set =
      if (matchedSet.isEmpty) None
      else Some(matchedSet.map { case (c, e) => c -> expr(e) }.toMap)
    val r = graft.streaming.Optimize.mergeInto(
      spark, GraftSqlParser.loc(spark, path, byName), spark.table(sourceView), keyCols, format,
      matchedSet = set, insertNotMatched = insertNotMatched,
      deleteNotMatchedBySource = deleteNotMatchedBySource)
    GraftSqlParser.refreshIfNamed(spark, path, byName)
    Seq(Row(r.rewrittenFiles.toLong, r.outputFiles.toLong, r.keptFiles.toLong, r.latestBatchId))
  }
}

case class GraftHistoryCommand(path: String, byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)(),
    AttributeReference("modified_ms", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.streaming.Optimize.listVersions(spark, GraftSqlParser.loc(spark, path, byName))
      .map(v => Row(v.version, v.files.toLong, v.modifiedMs))
}

case class GraftRestoreCommand(
    path: String, format: String, version: Long, byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("restored_files", LongType, nullable = false)(),
    AttributeReference("archived_current_as", LongType, nullable = false)(),
    AttributeReference("latest_batch_id", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val r = graft.streaming.Optimize.restoreTable(
      spark, GraftSqlParser.loc(spark, path, byName), version, format)
    GraftSqlParser.refreshIfNamed(spark, path, byName)
    Seq(Row(r.restoredVersion, r.restoredFiles.toLong, r.archivedCurrentAs, r.latestBatchId))
  }
}

case class GraftExpireHistoryCommand(path: String, keep: Int, byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("expired_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.streaming.Optimize
      .expireHistory(spark, GraftSqlParser.loc(spark, path, byName), keep).map(Row(_))
}

case class GraftVacuumCommand(
    path: String, format: String, graceMs: Long, byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("swept_file", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.streaming.StreamSinks.vacuum(
      spark, GraftSqlParser.loc(spark, path, byName), format, dryRun = false, graceMs)
      .map(Row(_))
}

case class GraftRepairCommand(path: String, byName: Boolean = false)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("status", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val status =
      graft.streaming.Optimize.repairOptimize(spark, GraftSqlParser.loc(spark, path, byName))
    GraftSqlParser.refreshIfNamed(spark, path, byName)
    Seq(Row(status))
  }
}
