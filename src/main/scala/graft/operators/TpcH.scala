package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}

/** The full TPC-H query corpus — the reference's only golden-answer
  * end-to-end gate (reference: flink-table-planner-blink
  * .../table/tpc/TpcHBatchExecITCase.scala:35,63-68 runs all 22 queries
  * against resources/tpch/result/{01..22}.out).
  *
  * Q1/Q3/Q5/Q10/Q12/Q17/Q18 shapes already exist in [[Relational]]
  * (q01/q03/q05/q65/q66/q28/q68); this module declares the remaining 15.
  * The driver fixtures diverge from stock TPC-H, so the queries are ports
  * that keep each query's *plan shape* (the join graph, the subquery
  * nesting, the decorrelation stress) while adapting predicates:
  *
  *   - no `partsupp` table → a bridge CTE derives it from lineitem:
  *     distinct (l_partkey, l_suppkey) with MIN(l_extendedprice) as the
  *     supply cost and SUM(l_quantity) as the available quantity. MIN over
  *     doubles is order-independent, so the bridge is hash-stable.
  *   - no l_commitdate/l_receiptdate → "late" = l_shipdate more than 60
  *     days after o_orderdate (keeps Q4/Q21's correlated non-equi shape).
  *   - no c_phone → country code = last two digits of c_name (Q22).
  *   - single-word p_type values → `p_type = 'PROMO'` instead of
  *     `LIKE 'PROMO%'` (Q14), container/shipmode predicates dropped (Q19).
  *
  * Subquery-heavy queries (Q2/Q4/Q11/Q15/Q16/Q20/Q21/Q22) execute ONE SQL
  * text on both engines — that text *is* the declared capability
  * (decorrelation: Catalyst RewritePredicateSubquery /
  * DecorrelateInnerQuery vs reference FlinkSubQueryRemoveRule). Join/agg
  * queries (Q6/Q7/Q8/Q9/Q13/Q14/Q19) are DataFrame-API implementations
  * with an equivalent oracle text.
  *
  * All money arithmetic is cast so products stay ≤ 18 digits — Spark's
  * long-backed Decimal fast path (see [[graft.core.Exact]]); values are
  * exact rationals, so both engines agree bit-for-bit after the final
  * cast to double.
  */
object TpcH {

  def defs: Seq[QueryDef] = Seq(
    tpch02, tpch04, tpch06, tpch07, tpch08, tpch09, tpch11, tpch13,
    tpch14, tpch15, tpch16, tpch19, tpch20, tpch21, tpch22)

  /** Exact revenue term, fast-path precisions, valid in both dialects. */
  private val REV =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2))"

  /** One SQL text, both engines: registers the fixture views and runs the
    * text through Spark SQL; the oracle runs the identical text in DuckDB. */
  private def sqlBoth(name: String, sql: String): QueryDef =
    QueryDef(name, sql) { (spark, dir) =>
      graft.core.Catalog.registerAnalyzed(spark, dir)
      spark.sql(sql)
    }

  /** Q2 min-cost supplier: correlated scalar subquery over the same join
    * graph as the outer query, CTE referenced twice (subplan reuse). */
  val tpch02: QueryDef = sqlBoth("tpch02_min_cost_supplier",
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         MIN(l_extendedprice) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM part, supplier, partsupp, nation, region
      |WHERE p_partkey = ps_partkey
      |  AND s_suppkey = ps_suppkey
      |  AND p_size <= 15
      |  AND p_type = 'LARGE'
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND ps_supplycost = (SELECT MIN(ps_supplycost)
      |                       FROM partsupp, supplier, nation, region
      |                       WHERE p_partkey = ps_partkey
      |                         AND s_suppkey = ps_suppkey
      |                         AND s_nationkey = n_nationkey
      |                         AND n_regionkey = r_regionkey
      |                         AND r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin)

  /** Q4 order-priority check: correlated EXISTS with a non-equi predicate
    * referencing the outer row's o_orderdate. */
  val tpch04: QueryDef = sqlBoth("tpch04_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin)

  /** Q6 forecast revenue change: tight scan+filter+ungrouped agg — the
    * pushdown showcase (all three predicates reach the parquet scan). */
  val tpch06: QueryDef = QueryDef("tpch06_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType) &&
              col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampType) &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
               col("l_discount").cast(DecimalType(3, 2)))
        .cast(DoubleType).as("revenue"))
  }

  /** Q7 volume shipping: two aliases of the same dimension (nation) joined
    * on different keys, symmetric pair filter, group by derived year. */
  val tpch07: QueryDef = QueryDef("tpch07_volume_shipping",
    s"""SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
       |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       |             $REV AS volume
       |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
       |        AND c_nationkey = n2.n_nationkey
       |        AND ((n1.n_regionkey = 2 AND n2.n_regionkey = 3)
       |          OR (n1.n_regionkey = 3 AND n2.n_regionkey = 2))
       |        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
       |                           AND TIMESTAMP '1997-12-31 00:00:00') shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    // nation-pair filter widened to the ASIA(2)/EUROPE(3) region pair so
    // the result is non-trivial at every fixture scale factor
    val n1 = t.nation.select(col("n_nationkey").as("s_nkey"),
      col("n_name").as("supp_nation"), col("n_regionkey").as("s_rkey"))
    val n2 = t.nation.select(col("n_nationkey").as("c_nkey"),
      col("n_name").as("cust_nation"), col("n_regionkey").as("c_rkey"))
    t.supplier
      .join(t.lineitem, col("s_suppkey") === col("l_suppkey"))
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter((col("s_rkey") === 2 && col("c_rkey") === 3) ||
              (col("s_rkey") === 3 && col("c_rkey") === 2))
      .filter(col("l_shipdate").between(
        lit("1996-01-01 00:00:00").cast(TimestampType),
        lit("1997-12-31 00:00:00").cast(TimestampType)))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(graft.core.Exact.mulOneMinus(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8 national market share: conditional-sum / sum ratio per year over an
    * 8-relation star (two nation aliases + region). One SQL text on both
    * engines, written in the classic worst-first FROM order — the
    * cost-based join reorder (live via [[graft.core.Catalog.registerAnalyzed]]
    * statistics, asserted in CboSpec) is what orders this graph, exactly as
    * the reference bench relies on join reorder for its TPC-DS graphs
    * (reference: TpcDsBatchExecITCase.scala:71-72). */
  val tpch08: QueryDef = sqlBoth("tpch08_market_share",
    s"""SELECT o_year,
       |  CAST(SUM(CASE WHEN nation = 'NATION_12' THEN volume ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
       |FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       |             $REV AS volume, n1.n_name AS nation
       |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
       |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
       |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
       |        AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
       |        AND r_name = 'ASIA' AND s_nationkey = n1.n_nationkey
       |        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
       |                            AND TIMESTAMP '1997-12-31 00:00:00'
       |        AND p_type = 'PROMO') all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin)

  /** Q9 product-type profit: profit = revenue − cost, cost adapted to
    * p_retailprice×quantity (no partsupp.ps_supplycost in the fixtures);
    * the (17,4)−(14,2) subtraction stays at (18,4) — still long-backed. */
  val tpch09: QueryDef = QueryDef("tpch09_profit",
    s"""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       |FROM (SELECT n_name AS nation,
       |             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       |             $REV - CAST(p_retailprice AS DECIMAL(10,2)) * CAST(l_quantity AS DECIMAL(3,0)) AS amount
       |      FROM part, supplier, lineitem, orders, nation
       |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
       |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
       |        AND p_name LIKE '%red%') profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val amount = graft.core.Exact.mulOneMinus(col("l_extendedprice"), col("l_discount")) -
      col("p_retailprice").cast(DecimalType(10, 2)) * col("l_quantity").cast(DecimalType(3, 0))
    t.part.filter(col("p_name").like("%red%"))
      .join(t.lineitem, col("p_partkey") === col("l_partkey"))
      .join(t.supplier, col("s_suppkey") === col("l_suppkey"))
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast(DoubleType).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q11 important stock: HAVING against an uncorrelated scalar subquery
    * re-aggregating the same CTE (threshold = fraction of grand total). */
  val tpch11: QueryDef = sqlBoth("tpch11_important_stock",
    """WITH suppval AS (
      |  SELECT l_suppkey, l_partkey,
      |         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_partkey AS ps_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
      |FROM suppval, supplier, nation
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_regionkey = 2
      |GROUP BY l_partkey
      |HAVING CAST(SUM(val) AS DOUBLE) > (
      |  SELECT CAST(SUM(val) AS DOUBLE) * 0.001
      |  FROM suppval, supplier, nation
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_regionkey = 2)
      |ORDER BY part_value DESC, ps_partkey""".stripMargin)

  /** Q13 customer distribution: LEFT OUTER join with the filter inside the
    * join condition, then a two-level aggregation (count per customer →
    * histogram of counts). */
  val tpch13: QueryDef = QueryDef("tpch13_customer_distribution",
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders,
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q14 promotion effect: conditional-revenue ratio over one month. */
  val tpch14: QueryDef = QueryDef("tpch14_promo_effect",
    s"""SELECT 100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $REV
       |                              ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       |         / CAST(SUM($REV) AS DOUBLE) AS promo_revenue
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey
       |  AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val rev = graft.core.Exact.mulOneMinus(col("l_extendedprice"), col("l_discount"))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1997-09-01 00:00:00").cast(TimestampType) &&
              col("l_shipdate") < lit("1997-10-01 00:00:00").cast(TimestampType))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.00) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(17, 4))))
          .cast(DoubleType) / sum(rev).cast(DoubleType)).as("promo_revenue"))
  }

  /** Q15 top supplier: CTE (the reference's `revenue0` view) consumed by
    * the outer join AND by an uncorrelated MAX scalar subquery — exact
    * decimal equality selects the winner. */
  val tpch15: QueryDef = sqlBoth("tpch15_top_supplier",
    s"""WITH revenue0 AS (
       |  SELECT l_suppkey AS supplier_no, SUM($REV) AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
       |FROM supplier, revenue0
       |WHERE s_suppkey = supplier_no
       |  AND total_rev = (SELECT MAX(total_rev) FROM revenue0)
       |ORDER BY s_suppkey""".stripMargin)

  /** Q16 parts/supplier relationship: distinct-count over the lineitem
    * bridge with a NOT IN subquery knocking out flagged suppliers. */
  val tpch16: QueryDef = sqlBoth("tpch16_parts_supplier",
    """WITH partsupp AS (
      |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      |  FROM lineitem)
      |SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
      |FROM partsupp, part
      |WHERE p_partkey = ps_partkey
      |  AND p_brand <> 'Brand#15'
      |  AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)

  /** Q19 discounted revenue: disjunction of conjunctive brand/size/qty
    * ranges — the OR-of-ANDs predicate the optimizer must evaluate inside
    * the join (reference runs it as a hash join with residual filter). */
  val tpch19: QueryDef = QueryDef("tpch19_discounted_revenue",
    s"""SELECT CAST(SUM($REV) AS DOUBLE) AS revenue
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey
       |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.part, col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30)))
      .agg(sum(graft.core.Exact.mulOneMinus(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
  }

  /** Q20 potential promotion: IN → IN → correlated scalar subquery, three
    * levels deep — the hardest decorrelation nest in the corpus besides
    * Q21. Availqty adapted to total shipped quantity per bridge pair. */
  val tpch20: QueryDef = sqlBoth("tpch20_potential_promotion",
    """WITH partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         CAST(SUM(l_quantity) AS BIGINT) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_name, s_acctbal
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |    SELECT ps_suppkey FROM partsupp
      |    WHERE ps_partkey IN (SELECT p_partkey FROM part
      |                         WHERE p_name LIKE 'red%' OR p_name LIKE 'blue%')
      |      AND ps_availqty > (SELECT 0.5 * SUM(l_quantity)
      |                         FROM lineitem
      |                         WHERE l_partkey = ps_partkey
      |                           AND l_suppkey = ps_suppkey
      |                           AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |                           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey IN (0, 1)
      |ORDER BY s_name""".stripMargin)

  /** Q21 suppliers who kept orders waiting: EXISTS + NOT EXISTS over the
    * same fact table with inequality correlation on the supplier key and
    * an outer-block non-equi date predicate — the corpus's double-
    * decorrelation stress test. */
  val tpch21: QueryDef = sqlBoth("tpch21_suppliers_waiting",
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey
      |  AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |  AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_3'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin)

  /** Q22 global sales opportunity: substring-derived country code, an
    * uncorrelated scalar AVG threshold, and NOT EXISTS anti join.
    * Country code adapted to the last two digits of c_name; "never
    * ordered" adapted to "no order since 2001" (every fixture customer
    * has at least one order, which would make the original anti join
    * degenerate-empty). */
  val tpch22: QueryDef = sqlBoth("tpch22_global_sales",
    """SELECT cntrycode, COUNT(*) AS numcust,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM (SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
      |      FROM customer
      |      WHERE SUBSTRING(c_name, 17, 2) IN ('12','17','23','29','30','31','41')
      |        AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                         FROM customer
      |                         WHERE c_acctbal > 0.00
      |                           AND SUBSTRING(c_name, 17, 2) IN ('12','17','23','29','30','31','41'))) custsale
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin)
}
