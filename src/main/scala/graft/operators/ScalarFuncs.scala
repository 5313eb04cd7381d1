package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** Scalar-function surface (SURVEY §2.2 "Scalar functions"): string,
  * date/time, math, conditional, array higher-order, map, and JSON
  * functions, plus the predicate family (`IN`/`BETWEEN`/`LIKE`/`<=>`)
  * and `from_csv` line parsing (the reference's R2 map generalized —
  * its demo pipeline is literally a CSV string-split + int parse,
  * reference OrcSinkTest.java:32-36).
  *
  * All of these are Catalyst built-ins running inside whole-stage
  * codegen — zero UDFs — so every query here is a single scan + project
  * (+ one hash agg where aggregated): the cheapest possible shape at any
  * scale. The engineering content is cross-engine exactness: each
  * function is paired with the DuckDB spelling that provably produces
  * identical bits (dayofweek origin, date_trunc return type, epoch()
  * double→bigint, NULL propagation in greatest/least, regexp '' vs NULL
  * on no-match — all verified by the oracle gate).
  */
object ScalarFuncs {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // String family over part names/types.
    "fn_string" -> { (spark, dir) =>
      Tables
        .part(spark, dir)
        .select(
          col("p_partkey"),
          concat_ws("|", upper(col("p_brand")), lower(col("p_type"))).as("tag"),
          substring(col("p_name"), 1, 8).as("prefix"),
          length(col("p_name")).as("name_len"),
          trim(lit(" x ")).as("trimmed"),
          element_at(split(col("p_type"), " "), 1).as("type_head"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          col("p_name").like("%a%").as("has_a"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          reverse(col("p_brand")).as("brand_rev"),
          instr(col("p_name"), "a").cast("long").as("a_pos")
        )
        .orderBy(col("p_partkey"))
    },

    // Edit distance (classic Levenshtein DP — identical integer
    // semantics in every engine, so values hash-match exactly) over a
    // BOUNDED pair set: part names for partkey ≤ 20, each unordered pair
    // once. The pair source is a broadcast nested-loop over two 20-row
    // sides — bounded by construction, never the full table (the fuzzy
    // string-match primitive is meant for candidate pairs emitted by a
    // banding stage, exactly like the near-dup verifies).
    "fn_edit_distance" -> { (spark, dir) =>
      val p = Tables
        .part(spark, dir)
        .filter(col("p_partkey") <= 20)
        .select(col("p_partkey"), col("p_name"))
      val a = p.select(col("p_partkey").as("k1"), col("p_name").as("n1"))
      val b = p.select(col("p_partkey").as("k2"), col("p_name").as("n2"))
      a.crossJoin(broadcast(b))
        .filter(col("k1") < col("k2"))
        .select(
          col("k1"),
          col("k2"),
          levenshtein(col("n1"), col("n2")).cast("long").as("dist"),
          (levenshtein(col("n1"), col("n2")) === 0).as("identical")
        )
        .orderBy(col("k1"), col("k2"))
    },

    // Date/time family over orders (ms-precision timestamps).
    "fn_datetime" -> { (spark, dir) =>
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          hour(col("o_orderdate")).as("h"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("2024-01-01").cast("timestamp")).cast("long").as("days_since"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          to_date(col("o_orderdate")).cast("timestamp").as("just_date")
        )
        .orderBy(col("o_orderkey"))
    },

    // Math family (IEEE-exact members only: sqrt is correctly rounded,
    // x*x replaces pow, round/floor/ceil/abs/sign are exact — log/exp
    // live in libm and differ across engines in the last ulp, so they're
    // exercised in ScalaTest, not the bit-exact oracle).
    "fn_math" -> { (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price_r2"),
          floor(col("l_discount") * 100).cast("long").as("disc_pct"),
          ceil(col("l_tax") * 100).cast("long").as("tax_pct"),
          abs(col("l_quantity") - 25.0).as("qty_dev"),
          sqrt(col("l_extendedprice")).as("price_sqrt"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          signum(col("l_discount") - 0.05).as("disc_sign")
        )
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Conditional family + null handling (na.fill / na.drop of SURVEY
    // row 12: nulls manufactured via nullif, repaired via coalesce/fill).
    "fn_conditional" -> { (spark, dir) =>
      val withNulls = Tables
        .customer(spark, dir)
        .select(
          col("c_custkey"),
          col("c_acctbal"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "standard")
            .otherwise("premium")
            .as("tier"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0"),
          least(col("c_acctbal"), lit(1000.0)).as("bal_cap1k")
        )
      withNulls.na
        .fill(Map("seg_or_null" -> "(redacted)"))
        .select(
          col("c_custkey"),
          col("seg_or_null").as("segment_filled"),
          col("tier"),
          col("bal_floor0"),
          col("bal_cap1k"),
          isnull(nullif(col("tier"), lit("premium"))).as("is_premium")
        )
        .orderBy(col("c_custkey"))
    },

    // Predicate family: IN, BETWEEN, LIKE, null-safe <=> (SURVEY row 10).
    "pred_filters" -> { (spark, dir) =>
      Tables
        .customer(spark, dir)
        .filter(
          col("c_mktsegment").isInCollection(Seq("BUILDING", "MACHINERY")) &&
            col("c_acctbal").between(0.0, 8000.0) &&
            col("c_name").like("Customer%") &&
            (nullif(col("c_nationkey"), lit(7)) <=> col("c_nationkey"))
        )
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    // Higher-order array functions over tokenized documents: transform,
    // filter, aggregate (fold), zip_with, slice, sort_array — all
    // reduced to scalar outputs for the hash compare.
    "fn_array" -> { (spark, dir) =>
      val ws = split(col("text"), " ")
      Tables
        .documents(spark, dir)
        .select(
          col("doc_id"),
          size(ws).as("n_tokens"),
          aggregate(transform(ws, w => length(w)), lit(0), (a, x) => a + x).as("chars_sum"),
          size(filter(ws, w => length(w) > 4)).as("n_long"),
          array_join(slice(sort_array(array_distinct(ws)), 1, 3), ",").as("first3_sorted"),
          array_contains(ws, "data").as("has_data"),
          array_join(zip_with(slice(ws, 1, 3), slice(reverse(ws), 1, 3), (a, b) => concat(a, lit(">"), b)), "|")
            .as("zipped")
        )
        .orderBy(col("doc_id"))
    },

    // Map functions: construct, keys, values, lookup.
    "fn_map" -> { (spark, dir) =>
      val m = map(lit("lang"), col("lang"), lit("source"), col("source"))
      Tables
        .documents(spark, dir)
        .select(
          col("doc_id"),
          array_join(map_keys(m), ",").as("ks"),
          array_join(map_values(m), ",").as("vs"),
          element_at(m, "lang").as("lang_lookup"),
          size(m).as("n_entries")
        )
        .orderBy(col("doc_id"))
    },

    // JSON over events.props (FIXTURES.md: `{"k": <int>}`):
    // get_json_object path extraction, from_json schema parse, to_json
    // re-serialization, then aggregate on the extracted value.
    "fn_json" -> { (spark, dir) =>
      Tables
        .events(spark, dir)
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)
          ))).getField("k").as("k2")
        )
        .groupBy(col("event_type"))
        .agg(
          sum(col("k")).as("sum_k"),
          sum(col("k2")).as("sum_k2"),
          count(when(col("k") > 50, 1)).as("n_big"),
          count(lit(1)).as("n")
        )
        .orderBy(col("event_type"))
    },

    // UDF + UDTF surface (SURVEY §2.3): a registered scalar Scala UDF
    // (the udf()/spark.udf.register path — deliberately; the SAME logic
    // as a codegen CASE lives in fn_conditional for the perf-minded) and
    // a generator (UDTF) via posexplode over a UDF-built array. UDFs
    // break whole-stage codegen, so production queries prefer built-ins;
    // this pins that the extension surface works and oracle-matches.
    "fn_udf_udtf" -> { (spark, dir) =>
      val tier = udf((bal: Double) => if (bal < 0) "neg" else if (bal < 5000) "mid" else "high")
      spark.udf.register("graft_tier", tier)
      val repeat = udf((s: String, n: Int) => Seq.fill(n)(s"$s#$n"))
      Tables
        .customer(spark, dir)
        .withColumn("tier", call_function("graft_tier", col("c_acctbal")))
        .select(col("c_custkey"), col("tier"), posexplode(repeat(col("tier"), lit(2))))
        .select(col("c_custkey"), col("tier"), col("pos"), col("col").as("gen"))
        .orderBy(col("c_custkey"), col("pos"))
    },

    // from_csv line parsing (reference R2): serialize three columns to a
    // CSV line, parse back with a schema, verify the round trip by
    // aggregating parsed values.
    "fn_csv_parse" -> { (spark, dir) =>
      val line = concat_ws(",", col("event_id"), col("user_id"), col("value"))
      Tables
        .events(spark, dir)
        .select(
          col("event_type"),
          from_csv(line, org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("c", org.apache.spark.sql.types.DoubleType)
          )), Map.empty[String, String]).as("r")
        )
        .select(col("event_type"), col("r.a").as("a"), col("r.b").as("b"), col("r.c").as("c"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("a")).as("sum_id"),
          countDistinct(col("b")).as("n_users"),
          dsum(col("c")).as("sum_value")
        )
        .orderBy(col("event_type"))
    },

    // Bitwise function family (key manipulation, bitmap-style flags):
    // AND/OR/XOR, shifts, bit_count, parity — pure codegen'd integer ops.
    "fn_bitwise" -> { (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          expr("l_orderkey & 255").as("and255"),
          expr("l_orderkey | 4096").as("or4096"),
          expr("l_orderkey ^ l_linenumber").as("xor_ln"),
          expr("shiftleft(l_linenumber, 3)").cast("long").as("shl3"),
          expr("shiftright(l_orderkey, 2)").as("shr2"),
          expr("bit_count(l_orderkey)").cast("long").as("popcnt"),
          (expr("bit_count(l_orderkey)") % 2 === 0).as("even_parity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Corrupt-record handling (PERMISSIVE parse): a deterministic 1-in-7
    // of the synthesized CSV lines carries a malformed numeric field;
    // from_csv must parse the well-formed fields, null the bad one, and
    // the pipeline aggregates good values while COUNTING the bad rows —
    // the operational contract of ingesting dirty data at scale (fail
    // the record, not the job). The oracle reconstructs the same
    // classification from the corruption rule, so a parser that silently
    // coerces or drops rows hash-mismatches.
    "csv_badrecords" -> { (spark, dir) =>
      val raw = concat_ws(
        ",",
        col("event_id"),
        col("user_id"),
        when(col("event_id") % 7 === 0, lit("xx")).otherwise(col("value").cast("string")))
      Tables
        .events(spark, dir)
        .select(col("event_type"), raw.as("line"))
        .select(
          col("event_type"),
          from_csv(col("line"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("c", org.apache.spark.sql.types.DoubleType)
          )), Map("mode" -> "PERMISSIVE")).as("r"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("r.c").isNull, 1L).otherwise(0L)).as("n_bad"),
          sum(floor(col("r.c") * 1000 + lit(0.5)).cast("long")).as("sum_good_q"))
        .orderBy(col("event_type"))
    },

    // UNPIVOT (wide → long reshape): two measure columns melt into
    // (measure, v) rows on the integer-cent grid. Pure map-side reshape
    // — rows × measures out, no shuffle until the final order.
    "fn_unpivot" -> { (spark, dir) =>
      Tables
        .lineitem(spark, dir)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("qty_c"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("price_c"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty_c"), col("price_c")),
          "measure",
          "v")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    }
  )

  val oracles: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey,
        |  concat_ws('|', upper(p_brand), lower(p_type)) AS tag,
        |  substring(p_name, 1, 8) AS prefix,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  trim(' x ') AS trimmed,
        |  string_split(p_type, ' ')[1] AS type_head,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  (p_name LIKE '%a%') AS has_a,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  reverse(p_brand) AS brand_rev,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_edit_distance" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey <= 20)
        |SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |  (levenshtein(a.p_name, b.p_name) = 0) AS identical
        |FROM p a JOIN p b ON a.p_partkey < b.p_partkey
        |ORDER BY k1, k2""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS d,
        |  CAST(hour(o_orderdate) AS INT) AS h,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS just_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 2) AS price_r2,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
        |  CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct,
        |  abs(l_quantity - 25.0) AS qty_dev,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  l_quantity * l_quantity AS qty_sq,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_conditional" ->
      """SELECT c_custkey,
        |  COALESCE(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS segment_filled,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 5000 THEN 'standard'
        |       ELSE 'premium' END AS tier,
        |  greatest(c_acctbal, 0.0) AS bal_floor0,
        |  least(c_acctbal, 1000.0) AS bal_cap1k,
        |  (nullif(CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |               WHEN c_acctbal < 5000 THEN 'standard'
        |               ELSE 'premium' END, 'premium') IS NULL) AS is_premium
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "pred_filters" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |  AND c_acctbal BETWEEN 0.0 AND 8000.0
        |  AND c_name LIKE 'Customer%'
        |  AND (nullif(c_nationkey, 7) IS NOT DISTINCT FROM c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "fn_array" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_tokens,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS INT) AS chars_sum,
        |  CAST(len(list_filter(ws, w -> length(w) > 4)) AS INT) AS n_long,
        |  array_to_string(list_slice(list_sort(list_distinct(ws)), 1, 3), ',') AS first3_sorted,
        |  list_contains(ws, 'data') AS has_data,
        |  array_to_string(list_transform(list_zip(list_slice(ws, 1, 3), list_slice(list_reverse(ws), 1, 3)),
        |    z -> z[1] || '>' || z[2]), '|') AS zipped
        |FROM t ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT doc_id,
        |  array_to_string(map_keys(MAP(['lang','source'], [lang, source])), ',') AS ks,
        |  array_to_string(map_values(MAP(['lang','source'], [lang, source])), ',') AS vs,
        |  map_extract(MAP(['lang','source'], [lang, source]), 'lang')[1] AS lang_lookup,
        |  CAST(cardinality(MAP(['lang','source'], [lang, source])) AS INT) AS n_entries
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_json" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k2,
        |  COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_big,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "fn_udf_udtf" ->
      """WITH tiers AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_acctbal < 0 THEN 'neg'
        |         WHEN c_acctbal < 5000 THEN 'mid'
        |         ELSE 'high' END AS tier
        |  FROM customer)
        |SELECT c_custkey, tier, pos, tier || '#2' AS gen
        |FROM tiers, (SELECT unnest([0, 1]) AS pos)
        |ORDER BY c_custkey, pos""".stripMargin,
    "fn_csv_parse" ->
      s"""SELECT event_type,
         |  CAST(SUM(event_id) AS BIGINT) AS sum_id,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  ${sqlSum("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS and255,
        |  l_orderkey | 4096 AS or4096,
        |  xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS xor_ln,
        |  CAST(l_linenumber << 3 AS BIGINT) AS shl3,
        |  l_orderkey >> 2 AS shr2,
        |  CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt,
        |  bit_count(l_orderkey) % 2 = 0 AS even_parity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "csv_badrecords" ->
      """SELECT event_type, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |  CAST(SUM(CASE WHEN event_id % 7 = 0 THEN NULL
        |           ELSE CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) END) AS BIGINT) AS sum_good_q
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "fn_unpivot" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, 'qty_c' AS measure, qty_c AS v FROM b
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'price_c', price_c FROM b
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin
  )
}
