package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Exact, QueryDef, Tables}

/** The relational operator surface (SURVEY.md §2.2-2.7): fused
  * project/filter, every join type (broadcast/shuffled-hash/SMJ/nested-loop,
  * inner/outer/semi/anti/cross), one- and two-phase hash/sort aggregation,
  * distinct aggregates, grouping sets/rollup/cube, OVER-window frames and
  * rank functions, top-n, sorts/limits/offsets and set operations — each
  * expressed with the declarative DataFrame API so Catalyst plans the
  * physical strategy (partial aggregation, broadcast selection, pushdown,
  * WindowGroupLimit) exactly as it would on a real cluster.
  *
  * Reference capability map: exec nodes under
  * flink-table-planner-blink .../plan/nodes/physical/batch (26 nodes) and
  * runtime operators under flink-table-runtime-blink .../runtime/operators
  * (SURVEY.md §2). Re-expressed Spark-first, not translated.
  */
object Relational {

  import Exact._

  def defs: Seq[QueryDef] = Seq(
    q01PricingSummary, q02CalcFilter, q03TopkRevenue, q04ExistsSemi,
    q05RegionRevenue, q06GlobalAgg, q07LeftJoinAgg, q08FullOuter,
    q09AntiJoin, q10CrossJoin, q11Rollup, q12Cube, q13GroupingSets,
    q14DistinctAgg, q15Union, q16UnionAll, q17Intersect, q18Except,
    q19IntersectAll, q20ExceptAll, q21WindowRank, q22WindowFrames,
    q23LeadLag, q24FirstLast, q25TopnPerGroup, q26LimitOffset,
    q27InSubquery, q28CorrelatedScalar, q29NotInNullAware, q30Having,
    q86DisjunctiveExists, q87RecursiveCte)

  /** TPC-H Q1 shape: scan → filter → two-phase hash agg → sort.
    * (reference: BatchExecHashAggregate.scala:43 + local/global split,
    * SURVEY §2.4). */
  val q01PricingSummary: QueryDef = QueryDef("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4)) * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(10,2))) AS DOUBLE) AS sum_charge,
      |  SUM(l_quantity) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sumD(col("l_extendedprice")).as("sum_base_price"),
        sum(mulOneMinus(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("sum_disc_price"),
        sum(mulOneMinusOnePlus(col("l_extendedprice"), col("l_discount"), col("l_tax"))).cast(DoubleType).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(dec2(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Fused project+filter ("Calc", reference BatchExecCalc.scala:49) with
    * expression evaluation; pushdown-friendly predicates. */
  val q02CalcFilter: QueryDef = QueryDef("q02_calc_filter",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
      |  upper(l_returnflag) AS flag_uc,
      |  l_quantity * 2 AS double_qty
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        mulOneMinus(col("l_extendedprice"), col("l_discount")).cast(DoubleType).as("net_price"),
        upper(col("l_returnflag")).as("flag_uc"),
        (col("l_quantity") * 2).as("double_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** TPC-H Q3 shape: 3-way join → agg → top-k (TakeOrderedAndProject). */
  val q03TopkRevenue: QueryDef = QueryDef("q03_topk_revenue",
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("2000-03-15 00:00:00").cast(TimestampType))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit("1996-03-15 00:00:00").cast(TimestampType))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(mulOneMinus(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"))
      .select(col("o_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** EXISTS → left-semi join (reference HashJoinType SEMI,
    * HashJoinOperator.java:58; Catalyst RewritePredicateSubquery). */
  val q04ExistsSemi: QueryDef = QueryDef("q04_exists_semi",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
              col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      .join(t.lineitem.filter(col("l_quantity") >= 48),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q5 shape: 6-way star join with small broadcast dims → agg.
    * nation/region are broadcast by Catalyst (they are tiny); the big
    * lineitem⋈orders join shuffles on the key — exactly the plan wanted
    * at 100 TB. */
  val q05RegionRevenue: QueryDef = QueryDef("q05_region_revenue",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
              col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(mulOneMinus(col("l_extendedprice"), col("l_discount"))).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Global (keyless) aggregation (reference AggWithoutKeysCodeGenerator). */
  val q06GlobalAgg: QueryDef = QueryDef("q06_global_agg",
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue,
      |  COUNT(*) AS n_lines,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum(dec2(col("l_extendedprice")) * dec2(col("l_discount"))).cast(DoubleType).as("promo_revenue"),
        count(lit(1)).as("n_lines"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
  }

  /** LEFT OUTER join with an agg on the nullable side. */
  val q07LeftJoinAgg: QueryDef = QueryDef("q07_left_join_agg",
    """SELECT o_orderstatus,
      |  COUNT(*) AS n_rows,
      |  COUNT(l_orderkey) AS n_matched,
      |  SUM(COALESCE(l_quantity, 0)) AS matched_qty
      |FROM orders
      |LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 49) big
      |  ON big.l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val big = t.lineitem.filter(col("l_quantity") >= 49)
    t.orders
      .join(big, big("l_orderkey") === col("o_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("l_orderkey")).as("n_matched"),
        sum(coalesce(col("l_quantity"), lit(0))).as("matched_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** FULL OUTER join of two aggregates (unmatched rows on both sides). */
  val q08FullOuter: QueryDef = QueryDef("q08_full_outer",
    """SELECT
      |  COALESCE(c.nk, s.nk) AS nationkey,
      |  c.n_customers, s.n_suppliers
      |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
      |      FROM customer WHERE c_acctbal > 6000 GROUP BY c_nationkey) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
      |      FROM supplier WHERE s_acctbal > 3000 GROUP BY s_nationkey) s
      |  ON c.nk = s.nk
      |ORDER BY nationkey NULLS FIRST, n_customers NULLS FIRST""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val c = t.customer.filter(col("c_acctbal") > 6000)
      .groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_customers"))
    val s = t.supplier.filter(col("s_acctbal") > 3000)
      .groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(s, c("nk") === s("nk"), "full_outer")
      .select(
        coalesce(c("nk"), s("nk")).as("nationkey"),
        col("n_customers"), col("n_suppliers"))
      .orderBy(col("nationkey").asc_nulls_first, col("n_customers").asc_nulls_first)
  }

  /** NOT EXISTS → left-anti join (reference HashJoinType ANTI). */
  val q09AntiJoin: QueryDef = QueryDef("q09_anti_join",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders.filter(col("o_orderstatus") === "P"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Cross join (reference BatchExecNestedLoopJoin; Spark
    * BroadcastNestedLoopJoin/CartesianProduct). */
  val q10CrossJoin: QueryDef = QueryDef("q10_cross_join",
    """SELECT r_name, st.o_orderstatus, r_regionkey
      |FROM region
      |CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) st
      |ORDER BY r_name, st.o_orderstatus""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val st = t.orders.select(col("o_orderstatus")).distinct()
    t.region.crossJoin(st)
      .select(col("r_name"), col("o_orderstatus"), col("r_regionkey"))
      .orderBy(col("r_name"), col("o_orderstatus"))
  }

  /** ROLLUP → Catalyst Expand (reference LogicalExpand /
    * DecomposeGroupingSetsRule.scala:205). */
  val q11Rollup: QueryDef = QueryDef("q11_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** CUBE over two order dimensions. */
  val q12Cube: QueryDef = QueryDef("q12_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumD(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** Explicit GROUPING SETS with grouping_id disambiguation. */
  val q13GroupingSets: QueryDef = QueryDef("q13_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
      |  SUM(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  SUM(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** Distinct aggregates (reference
    * FlinkAggregateExpandDistinctAggregatesRule; Catalyst
    * RewriteDistinctAggregates plans the Expand). */
  val q14DistinctAgg: QueryDef = QueryDef("q14_distinct_agg",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS nd_parts,
      |  COUNT(DISTINCT l_suppkey) AS nd_supps,
      |  SUM(DISTINCT l_quantity) AS sum_dist_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        sum_distinct(col("l_quantity")).as("sum_dist_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private def setOpInputs(t: Tables): (DataFrame, DataFrame) = {
    val a = t.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    val b = t.orders.filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("k"))
    (a, b)
  }
  private val setOpSqlA = "SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'"
  private val setOpSqlB = "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000"

  /** UNION (distinct) — union-all + distinct agg rewrite. */
  val q15Union: QueryDef = QueryDef("q15_union",
    s"""SELECT k FROM ($setOpSqlA UNION $setOpSqlB) ORDER BY k""") { (spark, dir) =>
    val (a, b) = setOpInputs(Tables(spark, dir))
    a.union(b).distinct().orderBy(col("k"))
  }

  /** UNION ALL — n-ary union, no shuffle. */
  val q16UnionAll: QueryDef = QueryDef("q16_union_all",
    s"""SELECT k FROM ($setOpSqlA UNION ALL $setOpSqlB) ORDER BY k""") { (spark, dir) =>
    val (a, b) = setOpInputs(Tables(spark, dir))
    a.unionAll(b).orderBy(col("k"))
  }

  /** INTERSECT → rewritten to semi join (reference
    * ReplaceIntersectWithSemiJoinRule; Catalyst has the same rule). */
  val q17Intersect: QueryDef = QueryDef("q17_intersect",
    s"""SELECT k FROM ($setOpSqlA INTERSECT $setOpSqlB) ORDER BY k""") { (spark, dir) =>
    val (a, b) = setOpInputs(Tables(spark, dir))
    a.intersect(b).orderBy(col("k"))
  }

  /** EXCEPT → rewritten to anti join (ReplaceMinusWithAntiJoinRule). */
  val q18Except: QueryDef = QueryDef("q18_except",
    s"""SELECT k FROM ($setOpSqlA EXCEPT $setOpSqlB) ORDER BY k""") { (spark, dir) =>
    val (a, b) = setOpInputs(Tables(spark, dir))
    a.except(b).orderBy(col("k"))
  }

  /** INTERSECT ALL — counted multiset rewrite (RewriteIntersectAllRule). */
  val q19IntersectAll: QueryDef = QueryDef("q19_intersect_all",
    s"""SELECT k FROM ($setOpSqlA INTERSECT ALL $setOpSqlB) ORDER BY k""") { (spark, dir) =>
    val (a, b) = setOpInputs(Tables(spark, dir))
    a.intersectAll(b).orderBy(col("k"))
  }

  /** EXCEPT ALL — counted multiset rewrite (RewriteMinusAllRule). */
  val q20ExceptAll: QueryDef = QueryDef("q20_except_all",
    s"""SELECT k FROM ($setOpSqlA EXCEPT ALL $setOpSqlB) ORDER BY k""") { (spark, dir) =>
    val (a, b) = setOpInputs(Tables(spark, dir))
    a.exceptAll(b).orderBy(col("k"))
  }

  /** Rank-function family over a partitioned window (reference
    * RankAggFunction/DenseRank/RowNumber, SURVEY §2.5). rank/dense_rank/
    * percent_rank/cume_dist are tie-stable so they may order by the raw
    * value; row_number gets a unique tiebreak for determinism. */
  val q21WindowRank: QueryDef = QueryDef("q21_window_rank",
    """SELECT c_nationkey, c_custkey, c_acctbal,
      |  RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
      |  DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
      |  ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
      |  NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |FROM customer
      |WHERE c_acctbal > 9000
      |ORDER BY c_nationkey, c_custkey""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val byBal = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
    val uniq = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t.customer.filter(col("c_acctbal") > 9000)
      .select(
        col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        rank().over(byBal).cast(LongType).as("rnk"),
        dense_rank().over(byBal).cast(LongType).as("drnk"),
        row_number().over(uniq).cast(LongType).as("rn"),
        ntile(4).over(uniq).cast(LongType).as("quartile"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** OVER-window frames: ROWS running/sliding + RANGE frame (reference
    * frame impls under RT/operators/over/frame/, SURVEY §2.5). */
  val q22WindowFrames: QueryDef = QueryDef("q22_window_frames",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
      |  SUM(l_quantity) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_quantity
      |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS range_qty_sum
      |FROM lineitem
      |WHERE l_suppkey < 3
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val seq = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val rng = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
    t.lineitem.filter(col("l_suppkey") < 3)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec2(col("l_extendedprice")))
          .over(seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_total"),
        sum(dec2(col("l_extendedprice")))
          .over(seq.rowsBetween(-2, Window.currentRow))
          .cast(DoubleType).as("moving_sum3"),
        sum(col("l_quantity"))
          .over(rng.rangeBetween(-5, Window.currentRow))
          .as("range_qty_sum"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** LEAD/LAG offset frames (reference LeadLagAggFunction/OffsetOverFrame). */
  val q23LeadLag: QueryDef = QueryDef("q23_lead_lag",
    """SELECT user_id, event_id, value,
      |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |  LEAD(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      |  LAG(event_type, 2, 'none') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS type_2_back
      |FROM events
      |WHERE user_id < 10
      |ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events.filter(col("user_id") < 10)
      .select(
        col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1, -1.0).over(w).as("next_value"),
        lag(col("event_type"), 2, "none").over(w).as("type_2_back"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** FIRST_VALUE / LAST_VALUE / NTH_VALUE over full-partition frames. */
  val q24FirstLast: QueryDef = QueryDef("q24_first_last",
    """SELECT user_id, event_id,
      |  FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
      |  LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
      |  NTH_VALUE(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_type
      |FROM events
      |WHERE user_id < 10
      |ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.events.filter(col("user_id") < 10)
      .select(
        col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Top-n per group: row_number ≤ k — Catalyst pushes the rank predicate
    * into WindowGroupLimit (reference RankOperator / FlinkLogicalRankRule:
    * the same rank-range pushdown). */
  val q25TopnPerGroup: QueryDef = QueryDef("q25_topn_per_group",
    """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 3
      |ORDER BY c_nationkey, rn""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t.customer
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"), col("rn"))
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** Global sort + LIMIT/OFFSET (reference BatchExecSortLimit / LimitOperator). */
  val q26LimitOffset: QueryDef = QueryDef("q26_limit_offset",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 5""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.orders
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(5)
      .limit(20)
  }

  /** IN-subquery → semi join. */
  val q27InSubquery: QueryDef = QueryDef("q27_in_subquery",
    """SELECT o_orderpriority, COUNT(*) AS n
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    Seq(t.orders, t.customer).zip(Seq("orders", "customer"))
      .foreach { case (df, n) => df.createOrReplaceTempView(n) }
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Correlated scalar subquery (TPC-H Q17 shape; reference
    * FlinkSubQueryRemoveRule / SingleValueAggFunction — Catalyst
    * RewriteCorrelatedScalarSubquery). avg over integral doubles is exact. */
  val q28CorrelatedScalar: QueryDef = QueryDef("q28_correlated_scalar",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n
      |FROM lineitem l1
      |WHERE l_partkey < 200
      |  AND l_quantity < (SELECT 0.5 * (SUM(l_quantity) / COUNT(*))
      |                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n
        |FROM lineitem l1
        |WHERE l_partkey < 200
        |  AND l_quantity < (SELECT 0.5 * (SUM(l_quantity) / COUNT(*))
        |                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
  }

  /** NOT IN over a subquery — null-aware anti join path (reference
    * NullAwareJoinHelper; SURVEY §7.4 risk item). */
  val q29NotInNullAware: QueryDef = QueryDef("q29_not_in_null_aware",
    """SELECT p_brand, COUNT(*) AS n
      |FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    Seq(t.part -> "part", t.lineitem -> "lineitem")
      .foreach { case (df, n) => df.createOrReplaceTempView(n) }
    spark.sql(
      """SELECT p_brand, COUNT(*) AS n
        |FROM part
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** GROUP BY + HAVING. */
  val q30Having: QueryDef = QueryDef("q30_having",
    """SELECT c_nationkey, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |GROUP BY c_nationkey
      |HAVING COUNT(*) > 5
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sumD(col("c_acctbal")).as("total_bal"))
      .filter(col("n") > 5)
      .orderBy(col("c_nationkey"))
  }

  /** Disjunctive EXISTS — subquery under OR, the decorrelation case the
    * reference routes through FlinkSubQueryRemoveRule and Catalyst handles
    * since 3.4 (DecorrelateInnerQuery). */
  val q86DisjunctiveExists: QueryDef = QueryDef("q86_disjunctive_exists",
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |   OR o_totalprice > 300000
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    graft.core.Catalog.registerAnalyzed(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |   OR o_totalprice > 300000
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Recursive CTE (Spark 4 feature; identical SQL runs on both engines):
    * a generated threshold spine joined against orders. */
  val q87RecursiveCte: QueryDef = QueryDef("q87_recursive_cte",
    """WITH RECURSIVE spine(step) AS (
      |  SELECT 1
      |  UNION ALL
      |  SELECT step + 1 FROM spine WHERE step < 20)
      |SELECT step, step * 25000 AS threshold,
      |  (SELECT count(*) FROM orders WHERE o_totalprice > step * 25000) AS n_above
      |FROM spine
      |ORDER BY step""".stripMargin) { (spark, dir) =>
    graft.core.Catalog.registerAnalyzed(spark, dir)
    spark.sql(
      """WITH RECURSIVE spine(step) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT step + 1 FROM spine WHERE step < 20)
        |SELECT step, step * 25000 AS threshold,
        |  (SELECT count(*) FROM orders WHERE o_totalprice > step * 25000) AS n_above
        |FROM spine
        |ORDER BY step""".stripMargin)
  }
}
