package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Det._

/** Scalar function families — SURVEY.md §2.8. One composite query per
  * family; every function is a built-in Catalyst expression, so the whole
  * projection stays inside WholeStageCodegen (no UDFs anywhere).
  *
  * Type discipline: integer-valued deriveds are cast to BIGINT on both
  * sides; doubles from math functions go through r4 (libm implementations
  * may differ in the last ulp between JVM and C++).
  */
object Scalars {

  /** fn_string — substr/upper/lower/trim/concat/length/replace/lpad. */
  val fnString: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        length(col("p_name")).cast("long").as("len_name"),
        substring(col("p_name"), 1, 5).as("pfx"),
        trim(concat(lit(" "), col("p_brand"), lit(" "))).as("trimmed"),
        concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), lit("a"), lit("@")).as("at_name"),
        lpad(col("p_type"), 12, ".").as("padded"))
      .orderBy("p_partkey")

  /** fn_regex — regexp_extract / regexp_replace / LIKE with ESCAPE. */
  val fnRegex: Q = (s, d) =>
    Tables.orders(s, d)
      .where(expr("o_orderpriority NOT LIKE '%!_%' ESCAPE '!'"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .select(
        col("o_orderpriority"),
        regexp_extract(col("o_orderpriority"), "^([0-9]+)", 1).cast("long").as("prio_num"),
        regexp_replace(col("o_orderpriority"), "[AEIOU]", "*").as("starred"),
        col("n"))
      .orderBy("o_orderpriority")

  /** fn_date — extraction, truncation, day arithmetic, add_months (both
    * engines clamp to end-of-month). */
  val fnDate: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
        add_months(col("o_orderdate"), 3).as("plus_3m"))
      .orderBy("o_orderkey")

  /** fn_math — round/abs/sqrt/ln/power/sign/mod over part attributes. */
  val fnMath: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        r4(col("p_retailprice")).as("price_r"),
        abs(col("p_size") - 25).cast("long").as("abs_sz"),
        r4(sqrt(col("p_retailprice"))).as("sqrt_price"),
        r4(log(col("p_retailprice"))).as("ln_price"),
        r4(pow(col("p_retailprice"), lit(0.5))).as("pow_price"),
        signum(col("p_retailprice") - 1000).cast("long").as("sign_1k"),
        (col("p_size") % 7).cast("long").as("mod7"))
      .orderBy("p_partkey")

  /** fn_cond — CASE ladder, coalesce/nullif, greatest/least. */
  val fnCond: Q = (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("tier"),
        r4(greatest(col("c_acctbal"), lit(1000.0))).as("floor_bal"),
        r4(least(col("c_acctbal"), lit(5000.0))).as("cap_bal"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("B!")).as("seg_tag"))
      .orderBy("c_custkey")

  /** fn_array — split → size/contains/slice/sort/distinct, scalars out. */
  val fnArray: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        array_contains(col("toks"), "spark").cast("int").as("has_spark"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
        element_at(sort_array(col("toks")), 1).as("first_sorted"),
        element_at(col("toks"), -1).as("last_tok"),
        array_join(slice(col("toks"), 1, 3), "_").as("first3"))
      .orderBy("doc_id")

  /** fn_explode — tokens to rows (built-in Generator = the UDTF surface). */
  val fnExplode: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .orderBy("doc_id", "token")

  /** fn_json — extract int from props JSON, filter on it. */
  val fnJson: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k") >= 50)
      .orderBy("event_id")

  /** fn_hash — delivery-integrity content hashes + length buckets. */
  val fnHash: Q = (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("md5_hex"),
        sha2(col("text").cast("binary"), 256).as("sha256_hex"),
        expr("n_chars div 100").as("len_bucket"))
      .orderBy("doc_id")

  /** fn_map — MapType surface: build a per-order linenumber→quantity-sum
    * map (keys made unique by pre-aggregation — the fixture repeats
    * linenumbers within an order — so construction order is irrelevant),
    * then extract only ORDER-INDEPENDENT scalars (size, lookup by key,
    * max key) — map internals never reach the output, so the oracle can
    * recompute the same scalars relationally. */
  val fnMap: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(sumR4(col("l_quantity")).as("sq"))
      .groupBy("l_orderkey")
      .agg(map_from_entries(collect_list(struct(col("l_linenumber"), col("sq")))).as("m"))
      .select(
        col("l_orderkey"),
        size(col("m")).cast("long").as("n_items"),
        expr("try_element_at(m, 1)").as("qty_at_1"), // null-safe under ANSI
        array_max(map_keys(col("m"))).cast("long").as("max_ln"))
      .orderBy("l_orderkey")

  /** fn_struct — nested struct scalar family (§2.8 gap beside map/array/
    * json): named_struct packing, nested field access, whole-struct
    * equality, and struct reconstruction under a filter. The oracle
    * verifies VALUES with plain column expressions (field access of a
    * just-packed struct is the packed column; struct equality is
    * pairwise equality) — the Spark side is what exercises the struct
    * machinery, the same division as the sink/roundtrip queries. All
    * codegen'd projections, shuffle only for the total order. */
  val fnStruct: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), struct(
        col("o_orderstatus").as("status"),
        struct(col("o_totalprice").as("total"),
               (col("o_totalprice") * 0.1).as("fee")).as("money")).as("ord"))
      .where(col("ord.money.total") > 100000.0)
      .select(
        col("o_orderkey"),
        col("ord.status").as("status"),
        r4(col("ord.money.total")).as("total"),
        r4(col("ord.money.fee")).as("fee"),
        // whole-struct comparison: repack and compare (true by
        // construction — pins struct equality semantics end-to-end)
        (col("ord.money") === struct(col("ord.money.total").as("total"),
          col("ord.money.fee").as("fee"))).cast("long").as("self_eq"))
      .orderBy("o_orderkey")

  /** fn_try — the error-handling scalar family (try_divide / try_cast /
    * try_to_timestamp): the dirty-data rails an ingestion pipeline runs
    * instead of letting one malformed row kill a 100 TB job. The query
    * exercises all three outcomes per family — a division that nulls on
    * a zero denominator (custkey mod 3), a cast that always succeeds
    * (the priority's leading digit), a cast that always fails (the full
    * priority string), a timestamp parse that always fails — and
    * censuses them per order status, with the surviving divisions
    * summed by the exact-scaled-int discipline (null-skipping sum, same
    * semantics both engines). The oracle mirrors try_divide as
    * x / nullif(y, 0) and the casts as TRY_CAST — DuckDB's equivalent
    * rails. */
  val fnTry: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderstatus"),
        expr("try_divide(o_totalprice, o_custkey % 3)").as("sdiv"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("pnum"),
        expr("try_cast(o_orderpriority AS INT)").as("pbad"),
        expr("try_to_timestamp(o_orderpriority)").as("tbad"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
           sum(when(col("sdiv").isNull, 1L).otherwise(0L)).as("div_nulls"),
           sumR4(col("sdiv")).as("div_sum"),
           count(col("pnum")).as("cast_ok"),
           count(col("pbad")).as("cast_bad_survivors"),
           count(col("tbad")).as("ts_survivors"),
           min("pnum").cast("long").as("min_prio"),
           max("pnum").cast("long").as("max_prio"))
      .orderBy("o_orderstatus")

  val queries: Map[String, Q] = Map(
    "fn_try"     -> fnTry,
    "fn_struct"  -> fnStruct,
    "fn_map"     -> fnMap,
    "fn_string"  -> fnString,
    "fn_regex"   -> fnRegex,
    "fn_date"    -> fnDate,
    "fn_math"    -> fnMath,
    "fn_cond"    -> fnCond,
    "fn_array"   -> fnArray,
    "fn_explode" -> fnExplode,
    "fn_json"    -> fnJson,
    "fn_hash"    -> fnHash,
  )

  val oracle: Map[String, String] = Map(
    "fn_try" ->
      s"""WITH t AS (
        | SELECT o_orderstatus,
        |  o_totalprice / nullif(o_custkey % 3, 0) AS sdiv,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pnum,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS pbad,
        |  TRY_CAST(o_orderpriority AS TIMESTAMP) AS tbad
        | FROM orders)
        |SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CASE WHEN sdiv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS div_nulls,
        | ${sumR4Sql("sdiv")} AS div_sum,
        | count(pnum) AS cast_ok,
        | count(pbad) AS cast_bad_survivors,
        | count(tbad) AS ts_survivors,
        | CAST(min(pnum) AS BIGINT) AS min_prio,
        | CAST(max(pnum) AS BIGINT) AS max_prio
        |FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "fn_struct" ->
      s"""SELECT o_orderkey, o_orderstatus AS status,
        | ${r4Sql("o_totalprice")} AS total,
        | ${r4Sql("o_totalprice * 0.1")} AS fee,
        | CAST(1 AS BIGINT) AS self_eq
        |FROM orders WHERE o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,
    "fn_map" ->
      s"""SELECT l_orderkey,
        | count(*) AS n_items,
        | max(CASE WHEN l_linenumber = 1 THEN sq END) AS qty_at_1,
        | CAST(max(l_linenumber) AS BIGINT) AS max_ln
        |FROM (SELECT l_orderkey, l_linenumber, ${sumR4Sql("l_quantity")} AS sq
        |      FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        | upper(p_name) AS up_name,
        | lower(p_brand) AS lo_brand,
        | CAST(length(p_name) AS BIGINT) AS len_name,
        | substr(p_name, 1, 5) AS pfx,
        | trim(concat(' ', p_brand, ' ')) AS trimmed,
        | concat(p_brand, '-', p_type) AS brand_type,
        | regexp_replace(p_name, 'a', '@', 'g') AS at_name,
        | lpad(p_type, 12, '.') AS padded
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_regex" ->
      """SELECT o_orderpriority,
        | CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS BIGINT) AS prio_num,
        | regexp_replace(o_orderpriority, '[AEIOU]', '*', 'g') AS starred,
        | count(*) AS n
        |FROM orders
        |WHERE o_orderpriority NOT LIKE '%!_%' ESCAPE '!'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(month(o_orderdate) AS BIGINT) AS mo,
        | CAST(day(o_orderdate) AS BIGINT) AS dy,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        | CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      s"""SELECT p_partkey,
        | ${r4Sql("p_retailprice")} AS price_r,
        | CAST(abs(p_size - 25) AS BIGINT) AS abs_sz,
        | ${r4Sql("sqrt(p_retailprice)")} AS sqrt_price,
        | ${r4Sql("ln(p_retailprice)")} AS ln_price,
        | ${r4Sql("power(p_retailprice, 0.5)")} AS pow_price,
        | CAST(sign(p_retailprice - 1000) AS BIGINT) AS sign_1k,
        | CAST(p_size % 7 AS BIGINT) AS mod7
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_cond" ->
      s"""SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 'neg'
        |      WHEN c_acctbal < 3000 THEN 'low'
        |      WHEN c_acctbal < 7000 THEN 'mid'
        |      ELSE 'high' END AS tier,
        | ${r4Sql("greatest(c_acctbal, 1000.0)")} AS floor_bal,
        | ${r4Sql("least(c_acctbal, 5000.0)")} AS cap_bal,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'B!') AS seg_tag
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        | CAST(list_contains(string_split(text, ' '), 'spark') AS INT) AS has_spark,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        | (list_sort(string_split(text, ' ')))[1] AS first_sorted,
        | (string_split(text, ' '))[len(string_split(text, ' '))] AS last_tok,
        | array_to_string((string_split(text, ' '))[1:3], '_') AS first3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_explode" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM documents ORDER BY doc_id, token""".stripMargin,
    "fn_json" ->
      """SELECT event_id, event_type,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,
    "fn_hash" ->
      """SELECT doc_id,
        | md5(text) AS md5_hex,
        | sha256(text) AS sha256_hex,
        | n_chars // 100 AS len_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
