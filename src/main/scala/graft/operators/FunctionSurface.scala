package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}
import graft.functions.GraftFunctions

/** The scalar-function surface (SURVEY.md §2.8 — reference
  * FlinkSqlOperatorTable.java / SqlFunctionUtils.java): string, math,
  * temporal, conditional and array/map functions, each evaluated over the
  * fixture tables and cross-checked against DuckDB. Every function here is
  * a Spark built-in (whole-stage-codegen'd) except the reference gap
  * functions in [[graft.functions.GraftFunctions]].
  */
object FunctionSurface {

  def defs: Seq[QueryDef] = Seq(
    q31StringFns, q32HashGapFns, q33MathFns, q34TemporalFns,
    q35ConditionalFns, q36ArrayFns, q77StringFns2, q81MapStructFns,
    q85NullSemantics)

  /** String function battery (CONCAT_WS/LPAD/RPAD/REPEAT/REVERSE/UPPER/
    * LOWER/INITCAP/TRIM/INSTR/ASCII/LENGTH/SUBSTring/MD5/SHA256/BASE64 —
    * reference FlinkSqlOperatorTable lines 228-850). */
  val q31StringFns: QueryDef = QueryDef("q31_string_fns",
    """SELECT doc_id,
      |  concat_ws('-', lang, source) AS tag,
      |  lpad(lang, 5, '*') AS lang_lpad,
      |  rpad(lang, 5, '#') AS lang_rpad,
      |  repeat(lang, 3) AS lang3,
      |  reverse(source) AS src_rev,
      |  upper(source) AS src_uc,
      |  upper(substring(source, 1, 1)) || lower(substring(source, 2)) AS src_initcap,
      |  trim('s' FROM source) AS src_trim,
      |  instr(text, 'spark') AS spark_pos,
      |  ascii(source) AS src_ascii,
      |  length(text) AS text_len,
      |  substring(text, 1, 20) AS text_head,
      |  string_split(text, ' ')[3] AS third_word,
      |  md5(source) AS src_md5,
      |  sha256(source) AS src_sha256,
      |  base64(encode(lang)) AS lang_b64,
      |  replace(lang, 'e', 'E') AS lang_repl
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.documents.select(
      col("doc_id"),
      concat_ws("-", col("lang"), col("source")).as("tag"),
      lpad(col("lang"), 5, "*").as("lang_lpad"),
      rpad(col("lang"), 5, "#").as("lang_rpad"),
      repeat(col("lang"), 3).as("lang3"),
      reverse(col("source")).as("src_rev"),
      upper(col("source")).as("src_uc"),
      initcap(col("source")).as("src_initcap"),
      trim(col("source"), "s").as("src_trim"),
      instr(col("text"), "spark").cast(LongType).as("spark_pos"),
      ascii(col("source")).as("src_ascii"),
      length(col("text")).cast(LongType).as("text_len"),
      substring(col("text"), 1, 20).as("text_head"),
      GraftFunctions.splitIndex(col("text"), " ", 2).as("third_word"),
      md5(col("source")).as("src_md5"),
      sha2(col("source"), 256).as("src_sha256"),
      base64(col("lang").cast(BinaryType)).as("lang_b64"),
      regexp_replace(col("lang"), "e", "E").as("lang_repl"))
      .orderBy(col("doc_id"))
  }

  /** Reference gap functions: SPLIT_INDEX, KEYVALUE, IS_DECIMAL/IS_DIGIT/
    * IS_ALPHA, HASH_CODE (custom codegen'd expression — Java
    * String.hashCode replicated in the oracle via list_reduce). */
  val q32HashGapFns: QueryDef = QueryDef("q32_hash_gap_fns",
    """SELECT event_id,
      |  string_split('type=' || event_type || '&uid=' || CAST(user_id AS VARCHAR), '&')[1] AS first_pair,
      |  list_filter(string_split('type=' || event_type || '&uid=' || CAST(user_id AS VARCHAR), '&'),
      |              x -> x LIKE 'uid=%')[1][5:] AS uid_value,
      |  props->>'$.k' AS json_k,
      |  CAST(regexp_matches(event_type, '^[A-Za-z]+$') AS BOOLEAN) AS type_is_alpha,
      |  CAST(regexp_matches(CAST(user_id AS VARCHAR), '^[0-9]+$') AS BOOLEAN) AS uid_is_digit,
      |  CAST(regexp_matches(CAST(value AS VARCHAR), '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$') AS BOOLEAN) AS val_is_decimal,
      |  list_reduce(
      |    list_transform(range(1, length(event_type)+1),
      |                   i -> CAST(unicode(substr(event_type, CAST(i AS INT), 1)) AS BIGINT)),
      |    (a, c) -> ((((31*a + c + 2147483648) % 4294967296) + 4294967296) % 4294967296) - 2147483648
      |  ) AS type_hash
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val kv = concat(lit("type="), col("event_type"), lit("&uid="), col("user_id").cast(StringType))
    t.events.filter(col("event_id") < 200).select(
      col("event_id"),
      GraftFunctions.splitIndex(kv, "&", 0).as("first_pair"),
      GraftFunctions.keyValue(kv, "&", "=", "uid").as("uid_value"),
      get_json_object(col("props"), "$.k").as("json_k"),
      GraftFunctions.isAlpha(col("event_type")).as("type_is_alpha"),
      GraftFunctions.isDigit(col("user_id").cast(StringType)).as("uid_is_digit"),
      GraftFunctions.isDecimal(col("value").cast(StringType)).as("val_is_decimal"),
      GraftFunctions.hashCode(col("event_type")).cast(LongType).as("type_hash"))
      .orderBy(col("event_id"))
  }

  /** Math battery (reference FlinkSqlOperatorTable math region; SURVEY
    * §2.8). Transcendentals agree bit-for-bit between JVM and DuckDB on
    * this data (verified empirically at the gate SF). */
  val q33MathFns: QueryDef = QueryDef("q33_math_fns",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_quantity - 25) AS abs_v,
      |  CAST(sign(l_quantity - 25) AS DOUBLE) AS sign_v,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
      |  sqrt(l_quantity) AS sqrt_q,
      |  power(l_quantity, 2) AS q_sq,
      |  fmod(l_extendedprice, 7.0) AS mod_p,
      |  round(ln(l_quantity), 6) AS ln_q,
      |  round(log10(l_quantity), 6) AS log10_q,
      |  round(log2(l_quantity), 6) AS log2_q,
      |  round(exp(l_discount), 6) AS exp_d,
      |  greatest(l_quantity, 25.0) AS gt_v,
      |  least(l_quantity, 25.0) AS lt_v,
      |  CAST(l_orderkey & 255 AS BIGINT) AS key_and,
      |  CAST(l_orderkey | 7 AS BIGINT) AS key_or,
      |  CAST(xor(l_orderkey, l_suppkey) AS BIGINT) AS key_xor,
      |  l_orderkey // 100 AS key_div
      |FROM lineitem WHERE l_orderkey < 1000 ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem.filter(col("l_orderkey") < 1000).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25).as("abs_v"),
      signum(col("l_quantity") - 25).as("sign_v"),
      floor(col("l_extendedprice")).as("floor_p"),
      ceil(col("l_extendedprice")).as("ceil_p"),
      sqrt(col("l_quantity")).as("sqrt_q"),
      pow(col("l_quantity"), 2).as("q_sq"),
      col("l_extendedprice") % 7.0 as "mod_p",
      round(log(col("l_quantity")), 6).as("ln_q"),
      round(log10(col("l_quantity")), 6).as("log10_q"),
      round(log2(col("l_quantity")), 6).as("log2_q"),
      round(exp(col("l_discount")), 6).as("exp_d"),
      greatest(col("l_quantity"), lit(25.0)).as("gt_v"),
      least(col("l_quantity"), lit(25.0)).as("lt_v"),
      col("l_orderkey").bitwiseAND(255).as("key_and"),
      col("l_orderkey").bitwiseOR(7).as("key_or"),
      col("l_orderkey").bitwiseXOR(col("l_suppkey")).as("key_xor"),
      GraftFunctions.divInt(col("l_orderkey"), lit(100)).as("key_div"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Temporal battery (reference SqlDateTimeUtils.java; SURVEY §2.8).
    * dayofweek convention differs (Spark 1=Sun, DuckDB 0=Sun) — oracle
    * adjusts. */
  val q34TemporalFns: QueryDef = QueryDef("q34_temporal_fns",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(day(o_orderdate) AS BIGINT) AS d,
      |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
      |  CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |  strftime(o_orderdate, '%Y-%m-%d') AS fmt,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end
      |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.orders.filter(col("o_orderkey") < 500).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast(LongType).as("y"),
      quarter(col("o_orderdate")).cast(LongType).as("q"),
      month(col("o_orderdate")).cast(LongType).as("m"),
      dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
      dayofweek(col("o_orderdate")).cast(LongType).as("dow"),
      dayofyear(col("o_orderdate")).cast(LongType).as("doy"),
      weekofyear(col("o_orderdate")).cast(LongType).as("woy"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
      datediff(lit("1998-01-01").cast(DateType), col("o_orderdate").cast(DateType)).cast(LongType).as("days_to_98"),
      add_months(col("o_orderdate").cast(DateType), 3).as("plus3m"),
      last_day(col("o_orderdate").cast(DateType)).as("month_end"))
      .orderBy(col("o_orderkey"))
  }

  /** Conditionals: CASE/COALESCE/NULLIF/IF/BETWEEN/IN/IS DISTINCT FROM
    * (reference FlinkSqlOperatorTable conditional region). */
  val q35ConditionalFns: QueryDef = QueryDef("q35_conditional_fns",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000 THEN 'big'
      |       WHEN o_totalprice > 100000 THEN 'mid'
      |       ELSE 'small' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
      |  CASE WHEN o_totalprice BETWEEN 50000 AND 150000 THEN 1 ELSE 0 END AS in_band,
      |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_urgent,
      |  CAST(o_orderstatus IS DISTINCT FROM 'F' AS BOOLEAN) AS not_f
      |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.orders.filter(col("o_orderkey") < 500).select(
      col("o_orderkey"),
      when(col("o_totalprice") > 200000, "big")
        .when(col("o_totalprice") > 100000, "mid")
        .otherwise("small").as("bucket"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
      when(col("o_totalprice").between(50000, 150000), 1).otherwise(0).as("in_band"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).as("is_urgent"),
      col("o_orderstatus") =!= lit("F") as "not_f")
      .orderBy(col("o_orderkey"))
  }

  /** Array surface over the embeddings table (reference ARRAY/ITEM/
    * CARDINALITY/ELEMENT operators — SURVEY §2.8 array region; the list
    * algebra is also the substrate of the similarity operators). */
  val q36ArrayFns: QueryDef = QueryDef("q36_array_fns",
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  embedding[1] AS first_v,
      |  embedding[64] AS last_v,
      |  list_max(embedding) AS max_v,
      |  list_min(embedding) AS min_v,
      |  list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, x) -> a + x) AS sum_v,
      |  list_sort(embedding[1:4])[1] AS min_of_head,
      |  CAST(list_contains(embedding, 0.0) AS BOOLEAN) AS has_zero
      |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.embeddings.filter(col("vec_id") < 100).select(
      col("vec_id"),
      size(col("embedding")).cast(LongType).as("dim"),
      element_at(col("embedding"), 1).as("first_v"),
      element_at(col("embedding"), 64).as("last_v"),
      array_max(col("embedding")).as("max_v"),
      array_min(col("embedding")).as("min_v"),
      aggregate(col("embedding"), lit(null).cast(DoubleType),
        (acc, x) => when(acc.isNull, x.cast(DoubleType)).otherwise(acc + x.cast(DoubleType))).as("sum_v"),
      array_min(slice(col("embedding"), 1, 4)).as("min_of_head"),
      array_contains(col("embedding"), 0.0f).as("has_zero"))
      .orderBy(col("vec_id"))
  }

  /** Second string battery: TRANSLATE/POSITION/LEFT/RIGHT/CHR/
    * SUBSTRING-from-end and PARSE_URL-style extraction (reference
    * FlinkSqlOperatorTable PARSE_URL:588 — emulated with the same regexes
    * on both engines since DuckDB has no parse_url). */
  val q77StringFns2: QueryDef = QueryDef("q77_string_fns2",
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) || '?q=' || lang AS url,
      |    source, lang
      |  FROM documents)
      |SELECT doc_id,
      |  translate(source, 'src', 'XYZ') AS src_tr,
      |  position('c' IN source) AS c_pos,
      |  left(source, 3) AS l3,
      |  right(source, 2) AS r2,
      |  chr(65 + CAST(doc_id % 26 AS INT)) AS letter,
      |  substring(source, greatest(length(source) - 1, 1)) AS tail2,
      |  regexp_extract(url, 'https?://([^/]+)', 1) AS host,
      |  regexp_extract(url, '[?]q=(\w+)', 1) AS query_param,
      |  regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path
      |FROM u ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val url = concat(lit("https://"), col("source"), lit(".example.com/p/"),
      col("doc_id").cast(StringType), lit("?q="), col("lang"))
    t.documents.select(
      col("doc_id"),
      translate(col("source"), "src", "XYZ").as("src_tr"),
      instr(col("source"), "c").cast(LongType).as("c_pos"),
      substring(col("source"), 1, 3).as("l3"),
      col("source").substr(greatest(length(col("source")) - 1, lit(1)), lit(2)).as("r2"),
      chr(lit(65) + (col("doc_id") % 26).cast(IntegerType)).as("letter"),
      col("source").substr(greatest(length(col("source")) - 1, lit(1)), length(col("source"))).as("tail2"),
      regexp_extract(url, "https?://([^/]+)", 1).as("host"),
      regexp_extract(url, "[?]q=(\\w+)", 1).as("query_param"),
      regexp_extract(url, "://[^/]+(/[^?]*)", 1).as("path"))
      .orderBy(col("doc_id"))
  }

  /** Map/struct constructors and access (reference MAP_VALUE_CONSTRUCTOR /
    * ROW / DOT / ITEM / CARDINALITY — SURVEY §2.8 array/map/row region).
    * DuckDB map subscripts return a one-element LIST, hence the [1]. */
  val q81MapStructFns: QueryDef = QueryDef("q81_map_struct_fns",
    """SELECT event_id,
      |  map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}['type'][1] AS m_type,
      |  CAST(cardinality(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}) AS INT) AS m_size,
      |  struct_pack(t := event_type, v := value).t AS s_type,
      |  struct_pack(t := event_type, v := value).v AS s_value
      |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val m = map(lit("type"), col("event_type"), lit("uid"), col("user_id").cast(StringType))
    val s = struct(col("event_type").as("t"), col("value").as("v"))
    t.events.filter(col("event_id") < 100).select(
      col("event_id"),
      element_at(m, "type").as("m_type"),
      size(m).as("m_size"),
      s.getField("t").as("s_type"),
      s.getField("v").as("s_value"))
      .orderBy(col("event_id"))
  }

  /** Three-valued-logic battery (SURVEY §7.4 risk item: the fixtures carry
    * no NULLs, so they are manufactured with an outer join + NULLIF):
    * COUNT(col) vs COUNT(*), NULL-safe equality, NULL propagation through
    * arithmetic/concat, COALESCE chains, NULLS FIRST ordering, and
    * aggregate NULL-skipping. */
  val q85NullSemantics: QueryDef = QueryDef("q85_null_semantics",
    """WITH j AS (
      |  SELECT o_orderkey, o_orderstatus, big.l_quantity AS q
      |  FROM orders
      |  LEFT JOIN (SELECT l_orderkey, max(l_quantity) AS l_quantity
      |             FROM lineitem WHERE l_quantity >= 49 GROUP BY l_orderkey) big
      |    ON big.l_orderkey = o_orderkey
      |  WHERE o_orderkey < 2000)
      |SELECT o_orderstatus,
      |  count(*) AS n_rows,
      |  count(q) AS n_notnull,
      |  CAST(sum(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(sum(CASE WHEN q IS NOT DISTINCT FROM 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exactly_50,
      |  CAST(sum(CASE WHEN (q + 1) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_arith_null,
      |  CAST(sum(CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullif,
      |  coalesce(CAST(max(q) AS VARCHAR), 'none') AS max_or_none,
      |  CAST(avg(q) IS NULL AS BOOLEAN) AS avg_all_null
      |FROM j
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val big = t.lineitem.filter(col("l_quantity") >= 49)
      .groupBy(col("l_orderkey")).agg(max(col("l_quantity")).as("q"))
    val j = t.orders.filter(col("o_orderkey") < 2000)
      .join(big, col("l_orderkey") === col("o_orderkey"), "left")
    j.groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("q")).as("n_notnull"),
        sum(when(col("q").isNull, 1).otherwise(0)).as("n_null"),
        sum(when(col("q") <=> lit(50.0), 1).otherwise(0)).as("n_exactly_50"),
        sum(when((col("q") + 1).isNull, 1).otherwise(0)).as("n_arith_null"),
        sum(when(nullif(col("o_orderstatus"), lit("O")).isNull, 1).otherwise(0)).as("n_nullif"),
        coalesce(max(col("q")).cast(StringType), lit("none")).as("max_or_none"),
        avg(col("q")).isNull.as("avg_all_null"))
      .orderBy(col("o_orderstatus").asc_nulls_first)
  }
}
