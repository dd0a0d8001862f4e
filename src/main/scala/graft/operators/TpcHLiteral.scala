package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.core.{Catalog, QueryDef}

/** The reference's remaining 7 TPC-H query TEXTS, run verbatim
  * (reference: flink-table-planner-blink
  * src/test/resources/tpch/queries/{01,03,05,10,12,17,18}.sql, the golden
  * files its TpcHBatchExecITCase.scala:63-68 compares via the 4-decimal
  * TpcUtils.formatResult). The other 15 texts' shapes run as the tpch*
  * family ([[TpcH]]); these 7 complete the reference's 22-query run list
  * in literal form, the same discipline as [[TpcDsLiteral]].
  *
  * The driver fixtures lack four columns the texts reference
  * (l_shipmode/l_commitdate/l_receiptdate, c_address/c_phone/c_comment,
  * p_container); a view layer synthesizes them with deterministic key
  * arithmetic — identical formulas on both engines — and casts the
  * arithmetic-bearing lineitem columns to DECIMAL so every sum in the
  * texts is exact on both engines (the [[TpcH]] money discipline, moved
  * into the view so the text itself stays unmodified).
  *
  * Two texts are structurally empty on the driver fixtures: q10 and q12
  * filter on 1994 date windows, and every fixture order/ship date is
  * ≥ 1995-01-01 — both engines agree on the empty result (same sanctioned
  * situation as the qds34/54/85 literals).
  */
object TpcHLiteral {

  def defs: Seq[QueryDef] = Seq(
    lit("tpch01_literal", Q01,
      castDouble = Set("sum_qty", "sum_base_price", "sum_disc_price",
        "sum_charge", "avg_qty", "avg_price", "avg_disc"),
      oracleFixup = exactAvgs(Seq("l_quantity", "l_extendedprice", "l_discount"))),
    lit("tpch03_literal", Q03, castDouble = Set("revenue")),
    lit("tpch05_literal", Q05, castDouble = Set("revenue")),
    lit("tpch10_literal", Q10, castDouble = Set("revenue")),
    lit("tpch12_literal", Q12,
      castBigint = Set("high_line_count", "low_line_count")),
    lit("tpch17_literal", Q17, castDouble = Set("avg_yearly"),
      oracleFixup = q17Exact),
    lit("tpch18_literal", Q18,
      outCols = Seq("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "o_totalprice", "sum_qty"),
      castDouble = Set("sum_qty")))

  // ---- synthesized view layer -------------------------------------------

  /** Derived-column formulas shared verbatim by both dialects (pure key
    * arithmetic — no engine-specific functions). */
  private val shipmodeExpr =
    """CASE CAST((l_orderkey * 3 + l_linenumber) % 7 AS INT)
      |  WHEN 0 THEN 'TRUCK' WHEN 1 THEN 'REG AIR' WHEN 2 THEN 'MAIL'
      |  WHEN 3 THEN 'SHIP' WHEN 4 THEN 'AIR' WHEN 5 THEN 'RAIL'
      |  ELSE 'FOB' END""".stripMargin
  private val containerExpr =
    """CASE CAST(p_partkey % 5 AS INT)
      |  WHEN 0 THEN 'JUMBO CAN' WHEN 1 THEN 'LG BOX' WHEN 2 THEN 'MED BAG'
      |  WHEN 3 THEN 'SM PKG' ELSE 'WRAP CASE' END""".stripMargin
  private val commitDelta = "CAST((l_orderkey * 5 + l_linenumber) % 61 - 30 AS INT)"
  private val receiptDelta = "CAST((l_orderkey * 11 + l_linenumber) % 31 AS INT)"

  /** The one dialect split: Spark spells date-plus-days `date_add(d, n)`,
    * DuckDB `d + n`. */
  private def lineitemView(dateAdd: (String, String) => String): String =
    s"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       |  CAST(l_quantity AS DECIMAL(12,2)) AS l_quantity,
       |  CAST(l_extendedprice AS DECIMAL(12,2)) AS l_extendedprice,
       |  CAST(l_discount AS DECIMAL(3,2)) AS l_discount,
       |  CAST(l_tax AS DECIMAL(3,2)) AS l_tax,
       |  l_returnflag, l_linestatus, l_shipdate,
       |  $shipmodeExpr AS l_shipmode,
       |  ${dateAdd("CAST(l_shipdate AS DATE)", commitDelta)} AS l_commitdate,
       |  ${dateAdd("CAST(l_shipdate AS DATE)", receiptDelta)} AS l_receiptdate
       |FROM """.stripMargin
  private val customerView =
    s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
       |  concat('addr-', CAST(c_custkey AS VARCHAR(20))) AS c_address,
       |  concat(CAST(10 + c_nationkey % 25 AS VARCHAR(4)), '-',
       |    lpad(CAST(c_custkey % 1000 AS VARCHAR(8)), 3, '0'), '-',
       |    lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR(8)), 3, '0'), '-',
       |    lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR(8)), 4, '0')) AS c_phone,
       |  concat('cmt-', CAST(c_custkey AS VARCHAR(20))) AS c_comment
       |FROM """.stripMargin
  private val partView =
    s"""SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
       |  $containerExpr AS p_container
       |FROM """.stripMargin
  private val ordersView =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |  o_orderdate, o_orderpriority,
       |  CAST(o_orderkey % 3 AS INT) AS o_shippriority
       |FROM """.stripMargin

  /** Spark side: analyzed catalog tables (CBO stats) + the three layered
    * temp views. registerAnalyzed drops stray temp views first, so the
    * view definitions always resolve the CATALOG tables — never an older
    * temp view of the same name. */
  private def registerViews(spark: SparkSession, dir: String): Unit = {
    // memoized per (session, dir) like the TPC-DS adapter: the marker is
    // unset whenever fixture-name temp views are dropped or re-shadowed
    // (Catalog.invalidateAdapterViews / the TPC-DS registrar), so a skip
    // always resolves the views registered below
    val marker = "graft.views.tpch.dir"
    if (spark.conf.getOption(marker).contains(dir)) return
    Catalog.registerAnalyzed(spark, dir) // unsets both adapter markers
    val sparkAdd = (d: String, n: String) => s"date_add($d, $n)"
    spark.sql(s"CREATE OR REPLACE TEMP VIEW lineitem AS\n${lineitemView(sparkAdd)}lineitem")
    spark.sql(s"CREATE OR REPLACE TEMP VIEW customer AS\n${customerView}customer")
    spark.sql(s"CREATE OR REPLACE TEMP VIEW part AS\n${partView}part")
    spark.sql(s"CREATE OR REPLACE TEMP VIEW orders AS\n${ordersView}orders")
    spark.conf.set(marker, dir)
  }

  /** DuckDB side: the same three definitions as CTEs over the base
    * fixture views, with the body's table references renamed onto them
    * (a CTE cannot shadow the base table it reads from). */
  private val duckAdd = (d: String, n: String) => s"($d + $n)"
  private def duckViews: String =
    s"""lineitem_v AS (\n${lineitemView(duckAdd)}lineitem),
       |customer_v AS (\n${customerView}customer),
       |part_v AS (\n${partView}part),
       |orders_v AS (\n${ordersView}orders)""".stripMargin
  /** Table-name rewrite that never reaches inside single-quoted string
    * literals: a verbatim text filtering on e.g. `o_comment LIKE
    * '%orders%'` must keep its constant intact or the oracle would query
    * a different value than Spark (round-7 advice). Quoted segments are
    * copied through untouched; the word-boundary renames apply only to
    * the SQL text between them. */
  private[operators] def renameTables(body: String): String = {
    val quoted = java.util.regex.Pattern.compile("'[^']*'")
    def renamePlain(s: String): String = s
      .replaceAll("\\blineitem\\b", "lineitem_v")
      .replaceAll("\\bcustomer\\b", "customer_v")
      .replaceAll("\\bpart\\b", "part_v")
      .replaceAll("\\borders\\b", "orders_v")
    val m = quoted.matcher(body)
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(renamePlain(body.substring(last, m.start())))
      sb.append(m.group())
      last = m.end()
    }
    sb.append(renamePlain(body.substring(last)))
    sb.toString
  }

  // ---- oracle exactness fixups ------------------------------------------

  /** Replace `avg(x)` over a DECIMAL(12,2)-view column with the exact
    * integer-cents HALF_UP emulation ([[TpcDsLiteral.duckAvgDec16_6]]):
    * Spark's decimal average is exact; DuckDB's routes through a double. */
  private def exactAvgs(cols: Seq[String])(body: String): String =
    cols.foldLeft(body)((b, c) => b.replace(s"avg($c)",
      TpcDsLiteral.duckAvgDec16_6(c)))

  /** q17: (a) the correlated threshold `0.2 * avg(l2.l_quantity)` must be
    * the exact scale-6 decimal Spark compares against (DuckDB's double avg
    * can flip a `l_quantity <` boundary); (b) the outer
    * `sum(l_extendedprice) / 7.0` is DECIMAL division in Spark (7.0 parses
    * as DECIMAL(2,1)): DECIMAL(22,2)/DECIMAL(2,1) → DECIMAL(27,6), one
    * HALF_UP rounding at scale 6 — not IEEE double division. Emulate with
    * integer cents: x = (S·10⁴ + 3) // 7 is round-half-up(S/700 · 10⁶)
    * for the positive sum. */
  private def q17Exact(body: String): String = {
    val s = "CAST(sum(l.l_extendedprice) * 100 AS HUGEINT)"
    val x = s"(($s * 10000 + 3) // 7)"
    body
      .replace("0.2 * avg(l2.l_quantity)",
        s"0.2 * ${TpcDsLiteral.duckAvgDec16_6("l2.l_quantity")}")
      .replace("sum(l.l_extendedprice) / 7.0",
        s"CAST(printf('%d.%06d', CAST($x // 1000000 AS BIGINT), " +
          s"CAST($x % 1000000 AS BIGINT)) AS DECIMAL(27,6))")
  }

  // ---- adapter ----------------------------------------------------------

  /** Same contract as [[TpcDsLiteral]]'s literal(): the text runs verbatim
    * through Spark SQL over the view layer; the oracle copy runs the same
    * text over the CTE renderings with representation-parity casts in an
    * outer projection only. The single text normalization applied to BOTH
    * sides is stripping the `day (3)` interval precision token (q01) —
    * Calcite-only syntax neither engine parses. */
  private def lit(name: String, text: String,
      outCols: Seq[String] = Nil,
      castBigint: Set[String] = Set.empty,
      castDouble: Set[String] = Set.empty,
      oracleFixup: String => String = identity): QueryDef = {
    val body = text.replace("day (3)", "day")
    val duckBody = oracleFixup(renameTables(body))
    def duckDouble(c: String) = s"CAST(CAST($c AS VARCHAR) AS DOUBLE) AS $c"
    val oracle =
      if (outCols.nonEmpty) {
        val proj = outCols.map(c =>
          if (castDouble(c)) duckDouble(c)
          else if (castBigint(c)) s"CAST($c AS BIGINT) AS $c"
          else c).mkString(", ")
        s"WITH $duckViews\nSELECT $proj FROM (\n$duckBody\n) t(${outCols.mkString(", ")})"
      } else if (castDouble.nonEmpty || castBigint.nonEmpty) {
        val repl = (castDouble.map(duckDouble) ++
          castBigint.map(c => s"CAST($c AS BIGINT) AS $c")).mkString(", ")
        s"WITH $duckViews\nSELECT * REPLACE ($repl) FROM (\n$duckBody\n) t"
      } else s"WITH $duckViews\n$duckBody"
    QueryDef(name, oracle) { (spark, dir) =>
      registerViews(spark, dir)
      val df = spark.sql(body)
      val named = if (outCols.nonEmpty) df.toDF(outCols: _*) else df
      castDouble.foldLeft(named)((d, c) =>
        d.withColumn(c, col(c).cast("double")))
    }
  }

  // ---- verbatim texts ---------------------------------------------------
  // reference: tpch/queries/01.sql
  private[operators] val Q01: String =
    """-- using 1395599672 as a seed to the RNG
      |
      |select
      |  l_returnflag,
      |  l_linestatus,
      |  sum(l_quantity) as sum_qty,
      |  sum(l_extendedprice) as sum_base_price,
      |  sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
      |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge,
      |  avg(l_quantity) as avg_qty,
      |  avg(l_extendedprice) as avg_price,
      |  avg(l_discount) as avg_disc,
      |  count(*) as count_order
      |from
      |  lineitem
      |where
      |  l_shipdate <= date '1998-12-01' - interval '120' day (3)
      |group by
      |  l_returnflag,
      |  l_linestatus
      |
      |order by
      |  l_returnflag,
      |  l_linestatus""".stripMargin

  // reference: tpch/queries/03.sql
  private[operators] val Q03: String =
    """-- tpch3 using 1395599672 as a seed to the RNG
      |select
      |  l.l_orderkey,
      |  sum(l.l_extendedprice * (1 - l.l_discount)) as revenue,
      |  o.o_orderdate,
      |  o.o_shippriority
      |
      |from
      |  customer c,
      |  orders o,
      |  lineitem l
      |
      |where
      |  c.c_mktsegment = 'HOUSEHOLD'
      |  and c.c_custkey = o.o_custkey
      |  and l.l_orderkey = o.o_orderkey
      |  and o.o_orderdate < date '1995-03-25'
      |  and l.l_shipdate > date '1995-03-25'
      |
      |group by
      |  l.l_orderkey,
      |  o.o_orderdate,
      |  o.o_shippriority
      |order by
      |  revenue desc,
      |  o.o_orderdate
      |limit 10""".stripMargin

  // reference: tpch/queries/05.sql
  private[operators] val Q05: String =
    """-- tpch5 using 1395599672 as a seed to the RNG
      |select
      |  n.n_name,
      |  sum(l.l_extendedprice * (1 - l.l_discount)) as revenue
      |
      |from
      |  customer c,
      |  orders o,
      |  lineitem l,
      |  supplier s,
      |  nation n,
      |  region r
      |
      |where
      |  c.c_custkey = o.o_custkey
      |  and l.l_orderkey = o.o_orderkey
      |  and l.l_suppkey = s.s_suppkey
      |  and c.c_nationkey = s.s_nationkey
      |  and s.s_nationkey = n.n_nationkey
      |  and n.n_regionkey = r.r_regionkey
      |  and r.r_name = 'EUROPE'
      |  and o.o_orderdate >= date '1997-01-01'
      |  and o.o_orderdate < date '1997-01-01' + interval '1' year
      |group by
      |  n.n_name
      |
      |order by
      |  revenue desc""".stripMargin

  // reference: tpch/queries/10.sql
  private[operators] val Q10: String =
    """-- tpch10 using 1395599672 as a seed to the RNG
      |select
      |  c.c_custkey,
      |  c.c_name,
      |  sum(l.l_extendedprice * (1 - l.l_discount)) as revenue,
      |  c.c_acctbal,
      |  n.n_name,
      |  c.c_address,
      |  c.c_phone,
      |  c.c_comment
      |from
      |  customer c,
      |  orders o,
      |  lineitem l,
      |  nation n
      |where
      |  c.c_custkey = o.o_custkey
      |  and l.l_orderkey = o.o_orderkey
      |  and o.o_orderdate >= date '1994-03-01'
      |  and o.o_orderdate < date '1994-03-01' + interval '3' month
      |  and l.l_returnflag = 'R'
      |  and c.c_nationkey = n.n_nationkey
      |group by
      |  c.c_custkey,
      |  c.c_name,
      |  c.c_acctbal,
      |  c.c_phone,
      |  n.n_name,
      |  c.c_address,
      |  c.c_comment
      |order by
      |  revenue desc
      |limit 20""".stripMargin

  // reference: tpch/queries/12.sql
  private[operators] val Q12: String =
    """-- tpch12 using 1395599672 as a seed to the RNG
      |select
      |  l.l_shipmode,
      |  sum(case
      |    when o.o_orderpriority = '1-URGENT'
      |      or o.o_orderpriority = '2-HIGH'
      |      then 1
      |    else 0
      |  end) as high_line_count,
      |  sum(case
      |    when o.o_orderpriority <> '1-URGENT'
      |      and o.o_orderpriority <> '2-HIGH'
      |      then 1
      |    else 0
      |  end) as low_line_count
      |from
      |  orders o,
      |  lineitem l
      |where
      |  o.o_orderkey = l.l_orderkey
      |  and l.l_shipmode in ('TRUCK', 'REG AIR')
      |  and l.l_commitdate < l.l_receiptdate
      |  and l.l_shipdate < l.l_commitdate
      |  and l.l_receiptdate >= date '1994-01-01'
      |  and l.l_receiptdate < date '1994-01-01' + interval '1' year
      |group by
      |  l.l_shipmode
      |order by
      |  l.l_shipmode""".stripMargin

  // reference: tpch/queries/17.sql
  private[operators] val Q17: String =
    """-- tpch17 using 1395599672 as a seed to the RNG
      |select
      |  sum(l.l_extendedprice) / 7.0 as avg_yearly
      |from
      |  lineitem l,
      |  part p
      |where
      |  p.p_partkey = l.l_partkey
      |  and p.p_brand = 'Brand#13'
      |  and p.p_container = 'JUMBO CAN'
      |  and l.l_quantity < (
      |    select
      |      0.2 * avg(l2.l_quantity)
      |    from
      |      lineitem l2
      |    where
      |      l2.l_partkey = p.p_partkey
      |  )""".stripMargin

  // reference: tpch/queries/18.sql
  private[operators] val Q18: String =
    """-- tpch18 using 1395599672 as a seed to the RNG
      |select
      |  c.c_name,
      |  c.c_custkey,
      |  o.o_orderkey,
      |  o.o_orderdate,
      |  o.o_totalprice,
      |  sum(l.l_quantity)
      |from
      |  customer c,
      |  orders o,
      |  lineitem l
      |where
      |  o.o_orderkey in (
      |    select
      |      l_orderkey
      |    from
      |      lineitem
      |    group by
      |      l_orderkey having
      |        sum(l_quantity) > 300
      |  )
      |  and c.c_custkey = o.o_custkey
      |  and o.o_orderkey = l.l_orderkey
      |group by
      |  c.c_name,
      |  c.c_custkey,
      |  o.o_orderkey,
      |  o.o_orderdate,
      |  o.o_totalprice
      |order by
      |  o.o_totalprice desc,
      |  o.o_orderdate
      |limit 100""".stripMargin
}
