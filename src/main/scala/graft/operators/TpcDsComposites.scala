package graft.operators

import graft.core.QueryDef

/** TPC-DS-style composite queries — the multi-CTE, multi-subquery
  * "monster" shapes that define the reference's breadth claim (reference:
  * TpcDsBatchExecITCase.scala:104-139 over 107 query files under
  * resources/tpcds/queries/1/). The fixture schema has no 24-table TPC-DS
  * catalog, so these transplant the *composition stress* onto the TPC-H
  * fixtures: CTEs consumed multiple times (the reference's
  * SubplanReuser.scala:53 — Spark's ReuseExchangeAndSubquery, asserted in
  * TpcDsCompositeSpec), INTERSECT/EXCEPT between channel aggregates,
  * scalar-subquery thresholds over reused aggregates, and UNION ALL of
  * per-channel branches. One SQL text runs on both engines.
  *
  * o_orderstatus (F/O/P) stands in for the store/web/catalog channel
  * split of q14a/q23a.
  */
object TpcDsComposites {

  def defs: Seq[QueryDef] =
    Seq(qds05, qds14, qds23, qds39, qds67, qds70, qds51, qds57, qds64,
      qds78, qds88, qds95)

  private val REV =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2))"

  private def sqlBoth(name: String, sql: String): QueryDef =
    QueryDef(name, sql) { (spark, dir) =>
      graft.core.Catalog.registerAnalyzed(spark, dir)
      spark.sql(sql)
    }

  /** q5 shape: per-channel sales/returns/profit reports UNION ALLed and
    * rolled up over (channel, brand) — the reference text's
    * ssr/csr/wsr CTEs + GROUP BY ROLLUP(channel, id). Returns are the
    * 'R'-flag lines of each channel (the fixture has no separate returns
    * table); profit = sales − returns stays an exact decimal until the
    * final double cast, so the rollup subtotals are bit-identical in both
    * engines. */
  val qds05: QueryDef = sqlBoth("qds05_channel_rollup",
    s"""WITH by_channel AS (
       |  SELECT CASE o_orderstatus WHEN 'F' THEN 'store'
       |                            WHEN 'O' THEN 'online'
       |                            ELSE 'pending' END AS channel,
       |         p_brand,
       |         SUM(CASE WHEN l_returnflag <> 'R' THEN $REV
       |                  ELSE CAST(0 AS DECIMAL(17,4)) END) AS sales,
       |         SUM(CASE WHEN l_returnflag = 'R' THEN $REV
       |                  ELSE CAST(0 AS DECIMAL(17,4)) END) AS returns
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |                JOIN part ON p_partkey = l_partkey
       |  GROUP BY 1, 2)
       |SELECT channel, p_brand,
       |       CAST(SUM(sales) AS DOUBLE) AS sales,
       |       CAST(SUM(returns) AS DOUBLE) AS returns,
       |       CAST(SUM(sales) - SUM(returns) AS DOUBLE) AS profit
       |FROM by_channel
       |GROUP BY ROLLUP(channel, p_brand)
       |ORDER BY channel NULLS FIRST, p_brand NULLS FIRST""".stripMargin)

  /** q14a shape: cross_items = parts present in ALL THREE channels (double
    * INTERSECT), an average-sales scalar CTE consumed by every branch's
    * HAVING, and a UNION ALL of the three per-channel aggregates. The
    * HAVING compares each brand's per-row average to the global average —
    * scale-invariant selectivity. */
  val qds14: QueryDef = sqlBoth("qds14_cross_channel",
    s"""WITH cross_items AS (
       |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'F'
       |  INTERSECT
       |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'O'
       |  INTERSECT
       |  SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'P'),
       |avg_sales AS (
       |  SELECT CAST(SUM($REV) AS DOUBLE) / COUNT(*) AS average_sales FROM lineitem)
       |SELECT channel, p_brand, sum_sales, number_sales FROM (
       |  SELECT 'store' AS channel, p_brand,
       |         CAST(SUM($REV) AS DOUBLE) AS sum_sales, COUNT(*) AS number_sales
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |                JOIN part ON p_partkey = l_partkey
       |  WHERE o_orderstatus = 'F' AND l_partkey IN (SELECT l_partkey FROM cross_items)
       |  GROUP BY p_brand
       |  HAVING CAST(SUM($REV) AS DOUBLE) / COUNT(*) > (SELECT average_sales FROM avg_sales)
       |  UNION ALL
       |  SELECT 'online' AS channel, p_brand,
       |         CAST(SUM($REV) AS DOUBLE) AS sum_sales, COUNT(*) AS number_sales
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |                JOIN part ON p_partkey = l_partkey
       |  WHERE o_orderstatus = 'O' AND l_partkey IN (SELECT l_partkey FROM cross_items)
       |  GROUP BY p_brand
       |  HAVING CAST(SUM($REV) AS DOUBLE) / COUNT(*) > (SELECT average_sales FROM avg_sales)
       |  UNION ALL
       |  SELECT 'pending' AS channel, p_brand,
       |         CAST(SUM($REV) AS DOUBLE) AS sum_sales, COUNT(*) AS number_sales
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |                JOIN part ON p_partkey = l_partkey
       |  WHERE o_orderstatus = 'P' AND l_partkey IN (SELECT l_partkey FROM cross_items)
       |  GROUP BY p_brand
       |  HAVING CAST(SUM($REV) AS DOUBLE) / COUNT(*) > (SELECT average_sales FROM avg_sales)
       |) x
       |ORDER BY channel, p_brand""".stripMargin)

  /** q23a shape: a per-customer aggregate CTE consumed TWICE (once as the
    * outer relation, once inside the MAX scalar subquery), a
    * frequent-items CTE over a pre-aggregate, and both feeding IN
    * subqueries of the final fact scan. */
  val qds23: QueryDef = sqlBoth("qds23_frequent_spenders",
    s"""WITH monthly AS (
       |  SELECT l_partkey, EXTRACT(MONTH FROM l_shipdate) AS m
       |  FROM lineitem GROUP BY 1, 2),
       |frequent_parts AS (
       |  SELECT l_partkey FROM monthly GROUP BY l_partkey HAVING COUNT(*) >= 10),
       |cust_total AS (
       |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
       |  FROM orders GROUP BY 1),
       |best_customers AS (
       |  SELECT o_custkey FROM cust_total
       |  WHERE CAST(total AS DOUBLE) > 0.5 * (SELECT CAST(MAX(total) AS DOUBLE) FROM cust_total))
       |SELECT CAST(SUM($REV) AS DOUBLE) AS total_revenue, COUNT(*) AS n
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE l_partkey IN (SELECT l_partkey FROM frequent_parts)
       |  AND o_custkey IN (SELECT o_custkey FROM best_customers)
       |  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'""".stripMargin)

  /** Channel EXCEPT + ROLLUP composite: parts moved in bulk (qty ≥ 48)
    * through the F channel but never in bulk through P, aggregated with a
    * brand/type rollup (grouping-set grammar over a set-op-derived
    * dimension). `only_f` is consumed as a JOIN relation, not an IN
    * filter: the semi-join form gets inferred onto BOTH sides of the
    * lineitem⋈part join and the whole EXCEPT pipeline (2 lineitem + 2
    * orders scans) is planned twice; the join form computes it once —
    * identical semantics because the EXCEPT output is a distinct key set
    * and p_partkey is unique. */
  val qds67: QueryDef = sqlBoth("qds67_except_rollup",
    s"""WITH f_parts AS (
       |  SELECT DISTINCT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'F' AND l_quantity >= 48),
       |p_parts AS (
       |  SELECT DISTINCT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'P' AND l_quantity >= 48),
       |only_f AS (
       |  SELECT l_partkey AS fkey FROM f_parts
       |  EXCEPT SELECT l_partkey FROM p_parts)
       |SELECT p_brand, p_type, COUNT(*) AS n, CAST(SUM($REV) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |  JOIN only_f ON fkey = p_partkey
       |GROUP BY ROLLUP(p_brand, p_type)
       |ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST""".stripMargin)

  /** q67 shape: window RANK over ROLLUP output — the subtotal rows
    * participate in the ranking within their own partitions (the grand
    * total ranks alone in the NULL-brand partition). RANK (not
    * ROW_NUMBER) keeps tie handling deterministic. */
  val qds70: QueryDef = sqlBoth("qds70_rank_rollup",
    s"""WITH agg AS (
       |  SELECT p_brand, p_type, CAST(SUM($REV) AS DOUBLE) AS sumsales
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  GROUP BY ROLLUP(p_brand, p_type))
       |SELECT p_brand, p_type, sumsales, rk FROM (
       |  SELECT p_brand, p_type, sumsales,
       |         CAST(RANK() OVER (PARTITION BY p_brand ORDER BY sumsales DESC) AS BIGINT) AS rk
       |  FROM agg) x
       |WHERE rk <= 3
       |ORDER BY p_brand NULLS FIRST, rk, p_type NULLS FIRST""".stripMargin)

  /** q57/q47 shape: a monthly per-brand revenue series with its own
    * yearly mean and ROW_NUMBER windows, then the SAME CTE consumed three
    * times — current / lag / lead rows stitched by consecutive rn (the
    * reference text's v1, v1_lag, v1_lead self-join) — keeping months that
    * deviate >10% from their year's mean. The yearly mean is an exact
    * decimal sum divided by a count (never AVG over doubles: window
    * accumulation order is engine-specific and the deviation filter sits
    * on the result), so both engines decide the 10% boundary identically. */
  val qds57: QueryDef = sqlBoth("qds57_seasonal_deviation",
    s"""WITH v1 AS (
       |  SELECT p_brand,
       |         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS y,
       |         CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS m,
       |         CAST(SUM($REV) AS DOUBLE) AS sum_sales,
       |         CAST(SUM(SUM($REV)) OVER (PARTITION BY p_brand, EXTRACT(YEAR FROM l_shipdate)) AS DOUBLE)
       |           / COUNT(*) OVER (PARTITION BY p_brand, EXTRACT(YEAR FROM l_shipdate)) AS avg_monthly,
       |         ROW_NUMBER() OVER (PARTITION BY p_brand
       |                            ORDER BY EXTRACT(YEAR FROM l_shipdate),
       |                                     EXTRACT(MONTH FROM l_shipdate)) AS rn
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  GROUP BY p_brand, EXTRACT(YEAR FROM l_shipdate), EXTRACT(MONTH FROM l_shipdate))
       |SELECT v1.p_brand, v1.y, v1.m,
       |       round(v1.sum_sales, 2) AS sum_sales,
       |       round(v1.avg_monthly, 2) AS avg_monthly,
       |       round(v1_lag.sum_sales, 2) AS psum,
       |       round(v1_lead.sum_sales, 2) AS nsum
       |FROM v1, v1 v1_lag, v1 v1_lead
       |WHERE v1.p_brand = v1_lag.p_brand
       |  AND v1.p_brand = v1_lead.p_brand
       |  AND v1.rn = v1_lag.rn + 1
       |  AND v1.rn = v1_lead.rn - 1
       |  AND v1.avg_monthly > 0
       |  AND abs(v1.sum_sales - v1.avg_monthly) / v1.avg_monthly > 0.1
       |ORDER BY v1.p_brand, v1.y, v1.m""".stripMargin)

  /** q64 shape: one wide multi-join aggregate CTE (5-table star with a
    * COUNT DISTINCT) consumed TWICE and self-joined across two consecutive
    * periods (cs1.syear = cs2.syear - 1, the reference's two-sales-years
    * join), keeping brands whose revenue grew. The period predicate lives
    * in the JOIN condition, not a WHERE — pushing a year filter into
    * either consumer would specialize the copies and forfeit the subplan
    * reuse the shape exists to exercise. */
  val qds64: QueryDef = sqlBoth("qds64_yoy_selfjoin",
    s"""WITH cs AS (
       |  SELECT p_brand AS brand,
       |         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS syear,
       |         CAST(SUM($REV) AS DOUBLE) AS revenue,
       |         COUNT(*) AS cnt,
       |         COUNT(DISTINCT o_custkey) AS n_cust
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN part ON p_partkey = l_partkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT cs1.brand, cs1.syear, round(cs1.revenue, 2) AS rev_y1,
       |       round(cs2.revenue, 2) AS rev_y2,
       |       cs1.cnt AS cnt_y1, cs2.cnt AS cnt_y2,
       |       cs1.n_cust AS cust_y1, cs2.n_cust AS cust_y2
       |FROM cs cs1 JOIN cs cs2
       |  ON cs1.brand = cs2.brand AND cs1.syear = cs2.syear - 1
       |WHERE cs2.revenue > cs1.revenue
       |ORDER BY cs1.brand, cs1.syear""".stripMargin)

  /** q51 shape: per-channel cumulative windows FULL OUTER joined and
    * compared — exact decimal running sums keep both engines
    * bit-identical after the final double cast. */
  val qds51: QueryDef = sqlBoth("qds51_cum_channels",
    """WITH m AS (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100
      |              + EXTRACT(MONTH FROM o_orderdate) AS INT) AS ym,
      |         o_orderstatus, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sales
      |  FROM orders GROUP BY 1, 2),
      |f AS (SELECT ym, CAST(SUM(sales) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_f
      |      FROM m WHERE o_orderstatus = 'F'),
      |o AS (SELECT ym, CAST(SUM(sales) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_o
      |      FROM m WHERE o_orderstatus = 'O'),
      |j AS (SELECT COALESCE(f.ym, o.ym) AS ym, cum_f, cum_o
      |      FROM f FULL OUTER JOIN o ON f.ym = o.ym)
      |SELECT ym, cum_f, cum_o FROM j WHERE cum_o > cum_f ORDER BY ym""".stripMargin)

  /** q88 shape: eight cross-joined single-row count aggregates over the
    * same fact⋈dim⋈dim subtree, differing only in the fact-side slice
    * (the reference slices store_sales by half-hour; here lineitem by
    * quantity band) and sharing an OR-of-ANDs dim predicate verbatim
    * (reference: tpcds/queries/1/q88.sql — s1..s8 derived tables). The
    * eight 1-row joins are the reference's own shape: each side is a
    * count(*), one row at any data scale, so the nested-loop chain is
    * scale-safe (PlanLint whitelists it); the shared orders⋈customer
    * build side must be planned once and reused, not eight times —
    * TpcDsCompositeSpec asserts the reuse. */
  val qds88: QueryDef = {
    val dimCond =
      """l_orderkey = o_orderkey AND o_custkey = c_custkey
        |      AND c_mktsegment = 'BUILDING'
        |      AND ((o_orderpriority = '1-URGENT' AND l_discount <= 0.05) OR
        |           (o_orderpriority = '2-HIGH' AND l_discount <= 0.07) OR
        |           (o_orderpriority = '3-MEDIUM' AND l_discount <= 0.09))""".stripMargin
    val slices = (0 until 8).map { i =>
      val (lo, hi) = (1 + 6 * i, 6 + 6 * i)
      s"""(SELECT count(*) AS qty_${lo}_to_$hi
         |    FROM lineitem, orders, customer
         |    WHERE $dimCond
         |      AND l_quantity BETWEEN $lo AND $hi) s${i + 1}""".stripMargin
    }
    sqlBoth("qds88_quantity_slices",
      s"SELECT * FROM\n${slices.mkString(",\n")}")
  }

  /** q39 shape: per-series volatility screening — monthly mean and
    * coefficient of variation per (brand, month) over a year of the
    * fact, cov-thresholded, then the series self-joined on consecutive
    * months (reference: tpcds/queries/1/q39a.sql — the inv CTE's
    * stddev_samp/avg with the `CASE mean WHEN 0` guard, consumed twice
    * for moy and moy+1). The stddev is decomposed into exact integer
    * sums (sum, sum-of-squares, count — the very rewrite the reference's
    * AggregateReduceFunctionsRule performs, SURVEY §2.4), so both
    * engines evaluate identical double arithmetic regardless of
    * aggregation order: quantities are whole numbers, the sums are
    * exact, and sqrt is IEEE-correctly-rounded everywhere. */
  val qds39: QueryDef = sqlBoth("qds39_monthly_volatility",
    """WITH g AS (
      |  SELECT p_brand, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
      |    SUM(CAST(l_quantity AS BIGINT)) AS sq,
      |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sq2,
      |    COUNT(*) AS n
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON p_partkey = l_partkey
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |f AS (
      |  SELECT p_brand, m,
      |    CAST(sq AS DOUBLE) / n AS mean,
      |    (CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n)
      |      / (n - 1) AS vs
      |  FROM g WHERE n > 1),
      |inv AS (
      |  SELECT p_brand, m, mean,
      |    CASE WHEN mean = 0 THEN NULL ELSE SQRT(vs) / mean END AS cov
      |  FROM f
      |  WHERE CASE WHEN mean = 0 THEN 0 ELSE SQRT(vs) / mean END > 0.5)
      |SELECT i1.p_brand,
      |  i1.m AS m1, round(i1.mean, 9) AS mean1, round(i1.cov, 9) AS cov1,
      |  i2.m AS m2, round(i2.mean, 9) AS mean2, round(i2.cov, 9) AS cov2
      |FROM inv i1 JOIN inv i2
      |  ON i1.p_brand = i2.p_brand AND i1.m = 3 AND i2.m = 4
      |ORDER BY i1.p_brand""".stripMargin)

  /** q78 shape — the ONE TPC-DS query the reference harness cannot run
    * (reference: TpcDsBatchExecITCase.scala:109 `// FIXME: Array("q78",
    * true) will block`): three per-channel CTEs of never-returned sales
    * (LEFT JOIN the returns slice, keep the null side — the classic
    * outer-join-as-anti shape q78 is notorious for), grouped by
    * (year, item), then the store channel LEFT JOINed against both other
    * channels with coalesce'd cross-channel totals and a rounded ratio.
    * Channel = o_orderstatus, returns slice = the R-flag lines keyed by
    * (orderkey, linenumber). A final item tiebreak makes the LIMIT
    * deterministic (the literal text can tie on every sort key). */
  val qds78: QueryDef = {
    def channel(alias: String, status: Char) =
      s"""$alias AS (
         |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS ${alias}_year,
         |         l_partkey AS ${alias}_item,
         |         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS ${alias}_qty,
         |         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS ${alias}_wc,
         |         SUM($REV) AS ${alias}_sp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  LEFT JOIN ret ON ret.r_okey = l_orderkey AND ret.r_line = l_linenumber
         |  WHERE o_orderstatus = '$status' AND ret.r_okey IS NULL
         |  GROUP BY 1, 2)""".stripMargin
    sqlBoth("qds78_channel_ratio",
      s"""WITH ret AS (
         |  SELECT l_orderkey AS r_okey, l_linenumber AS r_line
         |  FROM lineitem WHERE l_returnflag = 'R'),
         |${channel("ss", 'F')},
         |${channel("ws", 'O')},
         |${channel("cs", 'P')}
         |SELECT ss_year, ss_item,
         |  ROUND(CAST(ss_qty AS DOUBLE) /
         |        CAST(COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) AS DOUBLE), 2) AS ratio,
         |  CAST(ss_qty AS DOUBLE) AS store_qty,
         |  CAST(ss_wc AS DOUBLE) AS store_wholesale,
         |  CAST(ss_sp AS DOUBLE) AS store_sales,
         |  CAST(COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) AS DOUBLE) AS other_chan_qty,
         |  CAST(COALESCE(ws_wc, 0) + COALESCE(cs_wc, 0) AS DOUBLE) AS other_chan_wholesale,
         |  CAST(COALESCE(ws_sp, 0) + COALESCE(cs_sp, 0) AS DOUBLE) AS other_chan_sales
         |FROM ss
         |LEFT JOIN ws ON ws_year = ss_year AND ws_item = ss_item
         |LEFT JOIN cs ON cs_year = ss_year AND cs_item = ss_item
         |WHERE (COALESCE(ws_qty, 0) > 0 OR COALESCE(cs_qty, 0) > 0)
         |  AND ss_year = 1996
         |ORDER BY ss_year, store_qty DESC, store_wholesale DESC, store_sales DESC,
         |  other_chan_qty, other_chan_wholesale, other_chan_sales, ratio, ss_item
         |LIMIT 100""".stripMargin)
  }

  /** q95 shape: a fact self-join CTE (orders shipped by more than one
    * supplier — the reference's ws_wh warehouse self-join) consumed by
    * TWO IN-subqueries of the outer block, the second one joining the
    * CTE against the returns slice; count(DISTINCT key) over a
    * repeating join key plus exact-decimal money sums (reference:
    * tpcds/queries/1/q95.sql). The CTE must compute once — its exchange
    * is reused by both consumers (spec-asserted). DISTINCT inside the
    * self-join CTE: both consumers are IN-subqueries, so per-supplier-pair
    * fan-out is semantically invisible but quadratic on a skewed
    * multi-supplier order — dedup at the source, not after the joins. */
  val qds95: QueryDef = sqlBoth("qds95_multi_supplier",
    s"""WITH li_ms AS (
       |  SELECT DISTINCT l1.l_orderkey AS okey
       |  FROM lineitem l1, lineitem l2
       |  WHERE l1.l_orderkey = l2.l_orderkey
       |    AND l1.l_suppkey <> l2.l_suppkey),
       |returned AS (
       |  SELECT l_orderkey FROM lineitem, li_ms
       |  WHERE l_returnflag = 'R' AND l_orderkey = li_ms.okey)
       |SELECT COUNT(DISTINCT l_orderkey) AS order_count,
       |       CAST(SUM($REV) AS DOUBLE) AS total_revenue
       |FROM lineitem, orders, customer
       |WHERE l_orderkey = o_orderkey
       |  AND o_custkey = c_custkey
       |  AND c_mktsegment = 'MACHINERY'
       |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
       |  AND l_orderkey IN (SELECT okey FROM li_ms)
       |  AND l_orderkey IN (SELECT l_orderkey FROM returned)""".stripMargin)
}
