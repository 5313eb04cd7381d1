package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression for quantized cosine similarity over two
  * ARRAY<DOUBLE> columns (SURVEY §4.2 "custom Catalyst Expression"):
  * the codegen'd fast path for the hot inner loop of similarity search —
  * one fused loop computing dot + both norms, versus the composed
  * HOF formulation (zip_with → transform → aggregate ×3) which allocates
  * two intermediate arrays per row pair.
  *
  * Semantics are IDENTICAL to Similarity.qdot-based cosine: each product
  * is floor-quantized at 1e-6 in IEEE-double space, so results are
  * order-independent, bit-exact across engines, and the two formulations
  * are interchangeable under the DuckDB oracle
  * (CosineSimilaritySpec pins expression ≡ HOF bit equality).
  *
  * The reference has no expression framework at all (its per-record hook
  * is a raw MapFunction, reference OrcSinkTest.java:32-36); this is the
  * Spark-native extension point, registered session-wide via
  * `GraftExtensions` (SparkSessionExtensions → FunctionRegistry).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private val Scale = 1000000.0

  // Dimension mismatch or a null element → null result (not a silently
  // truncated/garbage similarity): cosine over ragged or hole-y vectors
  // has no defined value, and null propagates visibly to the caller.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += math.floor(xi * yi * Scale + 0.5)
      nx += math.floor(xi * xi * Scale + 0.5)
      ny += math.floor(yi * yi * Scale + 0.5)
      i += 1
    }
    val denom = math.sqrt((nx / Scale) * (ny / Scale))
    if (denom == 0.0) null else (dot / Scale) / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $x.numElements();
         |boolean $bad = ($n != $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |  double $xi = $x.getDouble($i);
         |  double $yi = $y.getDouble($i);
         |  $dot += java.lang.Math.floor($xi * $yi * $Scale + 0.5);
         |  $nx  += java.lang.Math.floor($xi * $xi * $Scale + 0.5);
         |  $ny  += java.lang.Math.floor($yi * $yi * $Scale + 0.5);
         |}
         |double $denom = java.lang.Math.sqrt(($nx / $Scale) * ($ny / $Scale));
         |if ($bad || $denom == 0.0) { ${ev.isNull} = true; } else {
         |  ${ev.value} = ($dot / $Scale) / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point; requires GraftExtensions registration on the
    * session (the function resolves by name at analysis time). */
  def column(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
}

/** Session-wide registration of graft's native expressions
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`, or
  * `GraftExtensions.register(spark)` for an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    ext.injectFunction(GraftExtensions.adcDistanceDescriptor)
    ext.injectFunction(GraftExtensions.signBandKeysDescriptor)
    ext.injectFunction(GraftExtensions.signBandProbesDescriptor)
    ext.injectTableFunction(GraftExtensions.similarityJoinTvf)
    ext.injectTableFunction(GraftExtensions.minhashPairsTvf)
    ext.injectTableFunction(GraftExtensions.spanDedupTvf)
    ext.injectTableFunction(GraftExtensions.rrfFuseTvf)
    ext.injectTableFunction(GraftExtensions.cosineTopkTvf)
    ext.injectTableFunction(GraftExtensions.asofJoinTvf)
    ext.injectTableFunction(GraftExtensions.lshTopkTvf)
    ext.injectTableFunction(GraftExtensions.packChunksTvf)
    ext.injectTableFunction(GraftExtensions.ewmaTvf)
    ext.injectTableFunction(GraftExtensions.maxsimTvf)
    ext.injectTableFunction(GraftExtensions.phraseSearchTvf)
    ext.injectTableFunction(GraftExtensions.phraseSearchIdxTvf)
    ext.injectTableFunction(GraftExtensions.bm25Tvf)
    ext.injectTableFunction(GraftExtensions.tableVersionTvf)
    ext.injectTableFunction(GraftExtensions.tableChangesTvf)
    ext.injectTableFunction(GraftExtensions.bpeTokenizeTvf)
    ext.injectOptimizerRule(_ => graft.plans.ExpandSimilarityJoin)
    // SQL DML/maintenance statements (GRAFT OPTIMIZE / DELETE / UPDATE /
    // VACUUM / REPAIR) — a delegating parser: unrecognized text falls
    // through to Spark's grammar untouched
    ext.injectParser((_, delegate) => new graft.plans.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  private val cosineDescriptor = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_cosine expects exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    }
  )

  private val adcDistanceDescriptor = (
    FunctionIdentifier("graft_adc_distance"),
    new ExpressionInfo(classOf[AdcDistance].getName, "graft_adc_distance"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_adc_distance expects exactly 2 arguments")
      AdcDistance(children.head, children(1))
    }
  )

  private def intArg(e: Expression, what: String, fn: String = "graft_sign_band_keys"): Int =
    e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"$fn: $what must be an int literal, got $other")
    }

  private val signBandKeysDescriptor = (
    FunctionIdentifier("graft_sign_band_keys"),
    new ExpressionInfo(classOf[SignBandKeys].getName, "graft_sign_band_keys"),
    (children: Seq[Expression]) => {
      require(
        children.length == 4 || children.length == 5,
        "graft_sign_band_keys expects (vector, bitsPerBand, bands, seed[, dim])")
      val seed = children(3) match {
        case Literal(v: Long, _) => v
        case Literal(v: Int, _)  => v.toLong
        case other => throw new IllegalArgumentException(s"graft_sign_band_keys: seed must be a literal, got $other")
      }
      val dim = if (children.length == 5) intArg(children(4), "dim") else SignBandKeys.DefaultDim
      SignBandKeys(children.head, intArg(children(1), "bitsPerBand"), intArg(children(2), "bands"), seed, dim)
    }
  )

  private val signBandProbesDescriptor = (
    FunctionIdentifier("graft_sign_band_probes"),
    new ExpressionInfo(classOf[SignBandProbes].getName, "graft_sign_band_probes"),
    (children: Seq[Expression]) => {
      require(
        children.length == 6,
        "graft_sign_band_probes expects (vector, bitsPerBand, bands, seed, dim, extraProbes)")
      val seed = children(3) match {
        case Literal(v: Long, _) => v
        case Literal(v: Int, _)  => v.toLong
        case other => throw new IllegalArgumentException(s"graft_sign_band_probes: seed must be a literal, got $other")
      }
      val fn = "graft_sign_band_probes"
      SignBandProbes(children.head, intArg(children(1), "bitsPerBand", fn),
        intArg(children(2), "bands", fn), seed, intArg(children(4), "dim", fn),
        intArg(children(5), "extraProbes", fn))
    }
  )

  /** SQL surface for the SIMILARITY JOIN engine node: a table function
    * over table NAMES (the reference's whole point is SQL-queryable
    * output — reference README.md:13,17), lowering to the same banded
    * plan as the Scala API. */
  private[graft] val similarityJoinTvf = (
    FunctionIdentifier("graft_similarity_join"),
    new ExpressionInfo(
      graft.plans.SimilarityJoinOps.getClass.getName, "graft_similarity_join"),
    (children: Seq[Expression]) => graft.plans.SimilarityJoinOps.sqlTableFunction(children)
  )

  /** SQL surface for MinHash-LSH near-dup pairs:
    * graft_minhash_pairs(table, docIdCol, textCol, threshold) →
    * (d1, d2, jaccard), same capped banded plan as the Scala operator. */
  private[graft] val minhashPairsTvf = (
    FunctionIdentifier("graft_minhash_pairs"),
    new ExpressionInfo(
      graft.operators.Dedup.getClass.getName, "graft_minhash_pairs"),
    (children: Seq[Expression]) => {
      require(
        children.length == 4,
        s"graft_minhash_pairs expects (table, docIdCol, textCol, threshold), got ${children.length}")
      def str(i: Int, what: String): String = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other =>
              throw new IllegalArgumentException(s"graft_minhash_pairs: $what must be a string literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_minhash_pairs: $what must be a literal, got $other")
      }
      val threshold = children(3) match {
        case e if e.foldable =>
          e.eval() match {
            case n: java.lang.Number                      => n.doubleValue()
            case d: org.apache.spark.sql.types.Decimal    => d.toDouble
            case other =>
              throw new IllegalArgumentException(s"graft_minhash_pairs: threshold must be numeric, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_minhash_pairs: threshold must be a literal, got $other")
      }
      val spark = SparkSession.active
      val d = spark
        .table(str(0, "table"))
        .select(
          org.apache.spark.sql.functions.col(str(1, "docIdCol")).as("doc_id"),
          org.apache.spark.sql.functions.col(str(2, "textCol")).as("text"))
      graft.operators.Dedup.minhashPairs(d, threshold).queryExecution.analyzed
    }
  )

  /** SQL surface for span-level exact dedup (Lee et al. 2022):
    * graft_span_dedup(table, docIdCol, textCol, k) →
    * (doc_id, n_tokens, n_dup_tokens, clean_text), the same
    * positional-shingle plan as the Scala operator. */
  private[graft] val spanDedupTvf = (
    FunctionIdentifier("graft_span_dedup"),
    new ExpressionInfo(
      graft.operators.Dedup.getClass.getName, "graft_span_dedup"),
    (children: Seq[Expression]) => {
      require(
        children.length == 4,
        s"graft_span_dedup expects (table, docIdCol, textCol, k), got ${children.length}")
      def str(i: Int, what: String): String = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other =>
              throw new IllegalArgumentException(s"graft_span_dedup: $what must be a string literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_span_dedup: $what must be a literal, got $other")
      }
      val k = children(3) match {
        case e if e.foldable =>
          e.eval() match {
            case n: java.lang.Number => n.intValue()
            case other =>
              throw new IllegalArgumentException(s"graft_span_dedup: k must be an int literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_span_dedup: k must be a literal, got $other")
      }
      val spark = SparkSession.active
      val d = spark
        .table(str(0, "table"))
        .select(
          org.apache.spark.sql.functions.col(str(1, "docIdCol")).as("doc_id"),
          org.apache.spark.sql.functions.col(str(2, "textCol")).as("text"))
      graft.operators.Dedup.removeDuplicateSpans(d, k).queryExecution.analyzed
    }
  )

  /** SQL surface for reciprocal-rank fusion:
    * graft_rrf_fuse(tableA, tableB, rrfK) over two (id, rank) ranked
    * lists → (id, leg1_rank, leg2_rank, rrf_score), the same
    * integer-exact full-outer fuse as the Scala operator. */
  private[graft] val rrfFuseTvf = (
    FunctionIdentifier("graft_rrf_fuse"),
    new ExpressionInfo(
      graft.operators.Similarity.getClass.getName, "graft_rrf_fuse"),
    (children: Seq[Expression]) => {
      require(
        children.length == 3,
        s"graft_rrf_fuse expects (tableA, tableB, rrfK), got ${children.length}")
      def str(i: Int, what: String): String = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other =>
              throw new IllegalArgumentException(s"graft_rrf_fuse: $what must be a string literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_rrf_fuse: $what must be a literal, got $other")
      }
      val k = children(2) match {
        case e if e.foldable =>
          e.eval() match {
            case n: java.lang.Number => n.intValue()
            case other =>
              throw new IllegalArgumentException(s"graft_rrf_fuse: rrfK must be an int literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_rrf_fuse: rrfK must be a literal, got $other")
      }
      val spark = SparkSession.active
      graft.operators.Similarity
        .rrfFuse(
          Seq("leg1" -> spark.table(str(0, "tableA")), "leg2" -> spark.table(str(1, "tableB"))),
          rrfK = k)
        .queryExecution.analyzed
    }
  )

  /** SQL surface for the as-of join — graft_asof_join(leftTable, leftKey,
    * leftTime, rightTable, rightKey, rightTime, payloadCols, direction);
    * arg parsing and lowering live with the operator
    * (AsOfJoin.sqlTableFunction). */
  private[graft] val asofJoinTvf = (
    FunctionIdentifier("graft_asof_join"),
    new ExpressionInfo(
      graft.operators.AsOfJoin.getClass.getName, "graft_asof_join"),
    (children: Seq[Expression]) => graft.operators.AsOfJoin.sqlTableFunction(children)
  )

  /** SQL surface for exact cosine top-K similarity search:
    * graft_cosine_topk(table, idCol, vecCol, probeIdBelow, k) →
    * (q_id, rnk, vec_id, cos). Probes are the table's rows with
    * id < probeIdBelow (self-matches excluded); scoring and planning are
    * the Scala `Similarity.cosineTopK` operator's, so SQL users get the
    * same broadcast-probes / streaming-corpus shape. */
  private[graft] val cosineTopkTvf = (
    FunctionIdentifier("graft_cosine_topk"),
    new ExpressionInfo(
      graft.operators.Similarity.getClass.getName, "graft_cosine_topk"),
    (children: Seq[Expression]) => {
      require(
        children.length == 5,
        s"graft_cosine_topk expects (table, idCol, vecCol, probeIdBelow, k), got ${children.length}")
      def str(i: Int, what: String): String = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other =>
              throw new IllegalArgumentException(s"graft_cosine_topk: $what must be a string literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_cosine_topk: $what must be a literal, got $other")
      }
      def num(i: Int, what: String): Int = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case n: java.lang.Number => n.intValue()
            case other =>
              throw new IllegalArgumentException(s"graft_cosine_topk: $what must be an integer literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_cosine_topk: $what must be a literal, got $other")
      }
      import org.apache.spark.sql.functions.{col, lit}
      val spark = SparkSession.active
      val t = spark
        .table(str(0, "table"))
        .select(
          col(str(1, "idCol")).as("vec_id"),
          col(str(2, "vecCol")).cast("array<double>").as("v"))
      val probes = t
        .filter(col("vec_id") < lit(num(3, "probeIdBelow")))
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      graft.operators.Similarity.cosineTopK(t, probes, num(4, "k")).queryExecution.analyzed
    }
  )

  /** Shared literal-arg readers for the table functions below. */
  private def tvfStr(fn: String)(e: Expression, what: String): String = e match {
    case x if x.foldable =>
      x.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other =>
          throw new IllegalArgumentException(s"$fn: $what must be a string literal, got $other")
      }
    case other => throw new IllegalArgumentException(s"$fn: $what must be a literal, got $other")
  }

  /** SQL surface for late-interaction MaxSim scoring:
    * graft_maxsim(docTokensTable, docCol, vecCol, queryTokensTable,
    * qtokCol, qvecCol) → (m_doc, maxsim). Lowering and arithmetic are
    * `Similarity.maxSimScores`' (query tokens broadcast, one streaming
    * scoring pass, 1e-6-grid re-quantization before the per-doc sum), so
    * a SQL-only user gets ColBERT-style scoring over any pair of temp
    * views — including an ANN candidate view, the rerank serving shape
    * sim_maxsim_rerank gates. */
  private[graft] val maxsimTvf = (
    FunctionIdentifier("graft_maxsim"),
    new ExpressionInfo(
      graft.operators.Similarity.getClass.getName, "graft_maxsim"),
    (children: Seq[Expression]) => {
      require(
        children.length == 6,
        s"graft_maxsim expects (docTokensTable, docCol, vecCol, queryTokensTable, qtokCol, qvecCol), got ${children.length}")
      val str = tvfStr("graft_maxsim") _
      import org.apache.spark.sql.functions.col
      val spark = SparkSession.active
      val docToks = spark
        .table(str(children(0), "docTokensTable"))
        .select(
          col(str(children(1), "docCol")).as("m_doc"),
          col(str(children(2), "vecCol")).cast("array<double>").as("v"))
      val qToks = spark
        .table(str(children(3), "queryTokensTable"))
        .select(
          col(str(children(4), "qtokCol")).as("qtok"),
          col(str(children(5), "qvecCol")).cast("array<double>").as("qv"))
      graft.operators.Similarity.maxSimScores(docToks, qToks).queryExecution.analyzed
    }
  )

  /** SQL surface for inverted-index phrase search:
    * graft_phrase_search(docsTable, idCol, textCol, 'the exact phrase')
    * → (doc_id, n_hits). Lowering is `TextIndex`'s (postings build +
    * term-selective leg joins on (doc_id, start)), so a SQL-only user
    * counts exact consecutive-phrase occurrences without a corpus-wide
    * regex scan. */
  private[graft] val phraseSearchTvf = (
    FunctionIdentifier("graft_phrase_search"),
    new ExpressionInfo(
      graft.operators.TextIndex.getClass.getName, "graft_phrase_search"),
    (children: Seq[Expression]) => {
      require(
        children.length == 4,
        s"graft_phrase_search expects (docsTable, idCol, textCol, phrase), got ${children.length}")
      val str = tvfStr("graft_phrase_search") _
      val spark = SparkSession.active
      val phrase = str(children(3), "phrase").split("\\s+").toSeq.filter(_.nonEmpty)
      val postings = graft.operators.TextIndex.buildPostings(
        spark.table(str(children(0), "docsTable")),
        str(children(1), "idCol"),
        str(children(2), "textCol"))
      graft.operators.TextIndex.phraseSearch(postings, phrase).queryExecution.analyzed
    }
  )

  /** SQL surface for phrase search through the PERSISTED postings
    * index: graft_phrase_search_idx(docsPath, indexDir, 'the phrase')
    * → (doc_id, n_hits). Lowering is `TextIndex.phraseSearchIndexed` —
    * the legs read the sidecar-committed, term-clustered index (per-
    * term file pruning) instead of re-exploding the corpus, and the
    * call REFUSES loudly when the doc table changed after indexing
    * (the staleness fingerprint), exactly like the Scala spelling. A
    * SQL-only user reaches the maintained index with one call; build
    * and refresh stay maintenance-side (buildPostingsIndex /
    * updatePostingsIndex), like any database index. */
  private[graft] val phraseSearchIdxTvf = (
    FunctionIdentifier("graft_phrase_search_idx"),
    new ExpressionInfo(
      graft.operators.TextIndex.getClass.getName, "graft_phrase_search_idx"),
    (children: Seq[Expression]) => {
      require(
        children.length == 3,
        s"graft_phrase_search_idx expects (docsPath, indexDir, phrase), got ${children.length}")
      val str = tvfStr("graft_phrase_search_idx") _
      val spark = SparkSession.active
      val phrase = str(children(2), "phrase").split("\\s+").toSeq.filter(_.nonEmpty)
      graft.operators.TextIndex
        .phraseSearchIndexed(spark, str(children(0), "docsPath"), str(children(1), "indexDir"), phrase)
        .queryExecution.analyzed
    }
  )

  /** SQL surface for BM25 ranked retrieval over a PERSISTED postings
    * index: graft_bm25(docsPath, indexDir, query, k) → (rnk, doc_id,
    * score). Lowering is [[graft.operators.TextIndex.bm25Search]] —
    * term-pruned tf legs, embedded doclen statistics, the Exact
    * quantization chain — including the staleness refusal. */
  private[graft] val bm25Tvf = (
    FunctionIdentifier("graft_bm25"),
    new ExpressionInfo(graft.operators.TextIndex.getClass.getName, "graft_bm25"),
    (children: Seq[Expression]) => {
      require(
        children.length == 4,
        s"graft_bm25 expects (docsPath, indexDir, query, k), got ${children.length}")
      val str = tvfStr("graft_bm25") _
      val spark = SparkSession.active
      val q = str(children(2), "query").split("\\s+").toSeq.filter(_.nonEmpty)
      val k = children(3) match {
        case Literal(v: Int, _) => v
        case other =>
          throw new IllegalArgumentException(s"graft_bm25: k must be an int literal, got $other")
      }
      graft.operators.TextIndex
        .bm25Search(spark, str(children(0), "docsPath"), str(children(1), "indexDir"), q, k)
        .queryExecution.analyzed
    }
  )

  /** SQL surface for TIME TRAVEL over a history-archived manifest table:
    * graft_table_version('<path>', n[, '<format>']) reads the rows of
    * archived version n ([[graft.streaming.Optimize.readVersion]]) —
    * no swap, no mutation, loud refusal once `GRAFT EXPIRE HISTORY` +
    * vacuum released the version's files. TIMESTAMP AS OF (r18): the
    * second argument may instead be a timestamp — a TIMESTAMP literal,
    * or a string 'yyyy-MM-dd[ HH:mm:ss[.f]]' — mapped to the latest
    * version archived at or before it
    * ([[graft.streaming.Optimize.versionAsOf]]; before-first-version
    * and clock-skew both refuse loudly). Pairs with `GRAFT HISTORY`
    * (list) and `GRAFT RESTORE` (swap back). */
  private[graft] val tableVersionTvf = (
    FunctionIdentifier("graft_table_version"),
    new ExpressionInfo(
      graft.streaming.Optimize.getClass.getName, "graft_table_version"),
    (children: Seq[Expression]) => {
      require(
        children.length == 2 || children.length == 3,
        s"graft_table_version expects (path, version-or-timestamp[, format]), " +
          s"got ${children.length}")
      val str = tvfStr("graft_table_version") _
      val spark = SparkSession.active
      val path = str(children.head, "path")
      import org.apache.spark.sql.types.{StringType, TimestampNTZType, TimestampType}
      def asOf(ms: Long): Long = graft.streaming.Optimize.versionAsOf(spark, path, ms)
      val version = children(1) match {
        case Literal(us: Long, TimestampType)    => asOf(us / 1000L)
        case Literal(us: Long, TimestampNTZType) => asOf(us / 1000L)
        case Literal(v: Int, _)                  => v.toLong
        case Literal(v: Long, _)                 => v
        case Literal(_, StringType) =>
          val s = str(children(1), "timestamp")
          val ms =
            try java.sql.Timestamp.valueOf(s).getTime
            catch {
              case _: IllegalArgumentException =>
                try java.sql.Date.valueOf(s).getTime
                catch {
                  case _: IllegalArgumentException => throw new IllegalArgumentException(
                    s"graft_table_version: '$s' is neither a version id, a " +
                      "'yyyy-MM-dd HH:mm:ss[.f]' timestamp, nor a 'yyyy-MM-dd' date")
                }
            }
          asOf(ms)
        case other => throw new IllegalArgumentException(
          s"graft_table_version: version must be an integer or timestamp literal, got $other")
      }
      val fmt = if (children.length == 3) str(children(2), "format") else "parquet"
      graft.streaming.Optimize
        .readVersion(spark, path, version, fmt)
        .queryExecution.analyzed
    }
  )

  /** SQL surface for the CHANGE FEED (r18 — CDC out):
    * graft_table_changes('<path>', v_from[, v_to][, '<format>']) returns
    * the rows inserted/deleted between two committed states
    * ([[graft.streaming.Optimize.tableChanges]] — manifest-diff file
    * sets, one exceptAll reconciliation over only the CHANGED files;
    * `v_to` omitted means the LIVE table). `_change_type` is
    * 'insert' | 'delete'; an update is delete(old)+insert(new);
    * copied-but-unchanged rows are never reported. Expired versions and
    * vacuumed spans refuse loudly. */
  private[graft] val tableChangesTvf = (
    FunctionIdentifier("graft_table_changes"),
    new ExpressionInfo(
      graft.streaming.Optimize.getClass.getName, "graft_table_changes"),
    (children: Seq[Expression]) => {
      require(
        children.length >= 2 && children.length <= 4,
        s"graft_table_changes expects (path, v_from[, v_to][, format]), " +
          s"got ${children.length}")
      val str = tvfStr("graft_table_changes") _
      val spark = SparkSession.active
      def intLit(e: Expression, what: String): Long = e match {
        case Literal(v: Int, _)  => v.toLong
        case Literal(v: Long, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_table_changes: $what must be an integer literal, got $other")
      }
      val vFrom = intLit(children(1), "v_from")
      import org.apache.spark.sql.types.StringType
      val (vTo, fmt) = children.drop(2) match {
        case Seq()                               => (None, "parquet")
        case Seq(Literal(_, StringType))         => (None, str(children(2), "format"))
        case Seq(v)                              => (Some(intLit(v, "v_to")), "parquet")
        case Seq(v, f)                           => (Some(intLit(v, "v_to")), str(f, "format"))
      }
      graft.streaming.Optimize
        .tableChanges(spark, str(children.head, "path"), vFrom, vTo, fmt)
        .queryExecution.analyzed
    }
  )

  /** SQL surface for the deterministic BPE tokenizer, TRAIN + APPLY in
    * one call: graft_bpe_tokenize(docsTable, idCol, textCol, nMerges)
    * → (idCol, n_bpe_tokens, tokens_md5). Lowering is `Bpe`'s (greedy
    * pair-merge training over the distinct-word table, then the N-deep
    * codegen'd replace chain per word), so a SQL-only user gets real
    * subword token counts without Scala. Training is cached per
    * (session, CONTENT SNAPSHOT, textCol, nMerges) — repeated calls and
    * plan-only paths (EXPLAIN) over unchanged contents never re-pay the
    * merge loop, while re-registering different contents under the same
    * view name (or rewriting the files behind it) retrains instead of
    * silently serving stale merges (Bpe.mergesForTable). */
  private[graft] val bpeTokenizeTvf = (
    FunctionIdentifier("graft_bpe_tokenize"),
    new ExpressionInfo(
      graft.operators.Bpe.getClass.getName, "graft_bpe_tokenize"),
    (children: Seq[Expression]) => {
      require(
        children.length == 4,
        s"graft_bpe_tokenize expects (docsTable, idCol, textCol, nMerges), got ${children.length}")
      val str = tvfStr("graft_bpe_tokenize") _
      val n = children(3) match {
        case e if e.foldable =>
          e.eval() match {
            case x: java.lang.Number if x.intValue() > 0 => x.intValue()
            case other => throw new IllegalArgumentException(
              s"graft_bpe_tokenize: nMerges must be a positive int literal, got $other")
          }
        case other => throw new IllegalArgumentException(
          s"graft_bpe_tokenize: nMerges must be a literal, got $other")
      }
      val spark = SparkSession.active
      val tableName = str(children(0), "docsTable")
      val idCol = str(children(1), "idCol")
      val textCol = str(children(2), "textCol")
      val merges = graft.operators.Bpe.mergesForTable(spark, tableName, textCol, n)
      graft.operators.Bpe
        .tokenize(spark.table(tableName), idCol, textCol, merges)
        .drop("tokens_str")
        .queryExecution.analyzed
    }
  )

  /** SQL surface for the index-free LSH-bucketed ANN search:
    * graft_lsh_topk(table, idCol, vecCol, probeIdBelow, k, bitsPerBand,
    * bands[, extraProbes]) → (q_id, rnk, vec_id, cos). Same engine as
    * `Similarity.lshSearch` (probe band keys broadcast, hot-bucket-capped
    * corpus band join, distinct candidates before the vector fetch), so a
    * SQL-only user reaches the sub-linear search path — and can compose
    * it with graft_cosine_topk in pure SQL to measure its own recall.
    * The optional 8th argument turns on multi-probe (extra lowest-margin
    * bucket probes per band, query side only — see SignBandProbes). */
  private[graft] val lshTopkTvf = (
    FunctionIdentifier("graft_lsh_topk"),
    new ExpressionInfo(
      graft.operators.Similarity.getClass.getName, "graft_lsh_topk"),
    (children: Seq[Expression]) => {
      require(
        children.length == 7 || children.length == 8,
        s"graft_lsh_topk expects (table, idCol, vecCol, probeIdBelow, k, bitsPerBand, bands[, extraProbes]), got ${children.length}")
      def str(i: Int, what: String): String = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other =>
              throw new IllegalArgumentException(s"graft_lsh_topk: $what must be a string literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_lsh_topk: $what must be a literal, got $other")
      }
      def num(i: Int, what: String): Int = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case n: java.lang.Number => n.intValue()
            case other =>
              throw new IllegalArgumentException(s"graft_lsh_topk: $what must be an integer literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_lsh_topk: $what must be a literal, got $other")
      }
      import org.apache.spark.sql.functions.{col, lit}
      val spark = SparkSession.active
      val t = spark
        .table(str(0, "table"))
        .select(
          col(str(1, "idCol")).as("vec_id"),
          col(str(2, "vecCol")).cast("array<double>").as("v"))
      val probes = t
        .filter(col("vec_id") < lit(num(3, "probeIdBelow")))
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val extraProbes = if (children.length == 8) num(7, "extraProbes") else 0
      graft.operators.Similarity
        .lshSearch(t, probes, num(5, "bitsPerBand"), num(6, "bands"), num(4, "k"),
          extraProbes = extraProbes)
        .queryExecution.analyzed
    }
  )

  /** SQL surface for packed-sequence layout:
    * graft_pack_chunks(table, idCol, textCol, ctx) → per-doc stream span
    * (doc_id, n_tokens, start_off, chunk_first, chunk_last,
    * n_chunks_spanned) under the ctx-token concatenate-and-chunk
    * packing — same two-pass distributed-cumsum plan as the Scala
    * operator (graft.operators.Chunking.packChunks). */
  private[graft] val packChunksTvf = (
    FunctionIdentifier("graft_pack_chunks"),
    new ExpressionInfo(
      graft.operators.Chunking.getClass.getName, "graft_pack_chunks"),
    (children: Seq[Expression]) => {
      require(
        children.length == 4,
        s"graft_pack_chunks expects (table, idCol, textCol, ctx), got ${children.length}")
      def str(i: Int, what: String): String = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other =>
              throw new IllegalArgumentException(s"graft_pack_chunks: $what must be a string literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_pack_chunks: $what must be a literal, got $other")
      }
      val ctx = children(3) match {
        case e if e.foldable =>
          e.eval() match {
            case n: java.lang.Number if n.intValue() > 0 => n.intValue()
            case other =>
              throw new IllegalArgumentException(s"graft_pack_chunks: ctx must be a positive int literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_pack_chunks: ctx must be a literal, got $other")
      }
      import org.apache.spark.sql.functions.col
      val spark = SparkSession.active
      val d = spark
        .table(str(0, "table"))
        .select(col(str(1, "idCol")).as("doc_id"), col(str(2, "textCol")).as("text"))
      graft.operators.Chunking.packChunks(d, ctx).queryExecution.analyzed
    }
  )

  /** SQL surface for the hot-key-parallel chunked EWMA:
    * graft_ewma(table, keyCol, tsCol, idCol, xCol) → (keyCol, n_events,
    * ewma_q) per key — the same chunked-renormalization plan as the
    * Scala operator (graft.operators.Ewma.ewmaByKey); xCol must already
    * be on the caller's integer grid (e.g. floor(value*100 + 0.5)). */
  private[graft] val ewmaTvf = (
    FunctionIdentifier("graft_ewma"),
    new ExpressionInfo(
      graft.operators.Ewma.getClass.getName, "graft_ewma"),
    (children: Seq[Expression]) => {
      require(
        children.length == 5,
        s"graft_ewma expects (table, keyCol, tsCol, idCol, xCol), got ${children.length}")
      def str(i: Int, what: String): String = children(i) match {
        case e if e.foldable =>
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other =>
              throw new IllegalArgumentException(s"graft_ewma: $what must be a string literal, got $other")
          }
        case other =>
          throw new IllegalArgumentException(s"graft_ewma: $what must be a literal, got $other")
      }
      import org.apache.spark.sql.functions.col
      val spark = SparkSession.active
      val names = Seq(str(1, "keyCol"), str(2, "tsCol"), str(3, "idCol"), str(4, "xCol"))
      val d = spark.table(str(0, "table")).select(names.map(col): _*)
      graft.operators.Ewma
        .ewmaByKey(d, names(0), names(1), names(2), names(3))
        .queryExecution.analyzed
    }
  )

  /** Late registration on a live session (tests, REPL): functions into
    * the registry, the SimilarityJoin lowering into the public
    * `experimental.extraOptimizations` hook (idempotent — analyzer rules
    * can't be added to a built session, optimizer rules can). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      cosineDescriptor._1, cosineDescriptor._2, cosineDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      adcDistanceDescriptor._1, adcDistanceDescriptor._2, adcDistanceDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      signBandKeysDescriptor._1, signBandKeysDescriptor._2, signBandKeysDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      signBandProbesDescriptor._1, signBandProbesDescriptor._2, signBandProbesDescriptor._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      similarityJoinTvf._1, similarityJoinTvf._2, similarityJoinTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      minhashPairsTvf._1, minhashPairsTvf._2, minhashPairsTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      spanDedupTvf._1, spanDedupTvf._2, spanDedupTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      rrfFuseTvf._1, rrfFuseTvf._2, rrfFuseTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      cosineTopkTvf._1, cosineTopkTvf._2, cosineTopkTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      asofJoinTvf._1, asofJoinTvf._2, asofJoinTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      lshTopkTvf._1, lshTopkTvf._2, lshTopkTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      packChunksTvf._1, packChunksTvf._2, packChunksTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      ewmaTvf._1, ewmaTvf._2, ewmaTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      maxsimTvf._1, maxsimTvf._2, maxsimTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      phraseSearchTvf._1, phraseSearchTvf._2, phraseSearchTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      bm25Tvf._1, bm25Tvf._2, bm25Tvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      tableVersionTvf._1, tableVersionTvf._2, tableVersionTvf._3)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      bpeTokenizeTvf._1, bpeTokenizeTvf._2, bpeTokenizeTvf._3)
    // SQL names for the typed sketch Aggregators (UDAFs can't ride
    // SparkSessionExtensions — no Expression builder for ScalaAggregator
    // — so they register per-session here; idempotent overwrite). The
    // fixed parameters are documented guarantees: graft_freq_items
    // undercounts within n/17, graft_quantile_summary is the k=256
    // compactor whose state carries its own rank-error certificate.
    spark.udf.register(
      "graft_freq_items",
      org.apache.spark.sql.functions.udaf(new FreqItems(16), org.apache.spark.sql.Encoders.STRING))
    spark.udf.register(
      "graft_quantile_summary",
      org.apache.spark.sql.functions.udaf(new QuantileSketch(256), org.apache.spark.sql.Encoders.scalaDouble))
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ExpandSimilarityJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ExpandSimilarityJoin
  }
}
