package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Exact, QueryDef, Tables}

/** Deeper multi-join analytics shapes from the reference's TPC-H/TPC-DS
  * corpus (queries under
  * flink-table-planner-blink src/test/resources/tpch/queries and
  * tpcds/queries — SURVEY.md §5), adapted to the fixture schema: returns
  * analysis (Q10 shape), conditional aggregation (Q12 shape), big-order
  * customers via HAVING-subquery (Q18 shape), and the STDDEV/VAR family
  * computed through the same sum/count rewrite the reference's
  * AggregateReduceFunctionsRule performs (keeps results deterministic
  * under any merge order — built-in Welford-style stddev is not). */
object Analytics {

  import Exact._

  def defs: Seq[QueryDef] = Seq(
    q65ReturnsAnalysis, q66PriorityMix, q67StatsRewrite, q68BigOrders,
    q75DecimalEdge, q82Percentiles)

  /** TPC-H Q10 shape: revenue lost to returns per customer, top 20. */
  val q65ReturnsAnalysis: QueryDef = QueryDef("q65_returns_analysis",
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
              col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(mulOneMinus(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape: conditional (CASE-based) aggregation — high- vs
    * low-priority line counts per linestatus. */
  val q66PriorityMix: QueryDef = QueryDef("q66_priority_mix",
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t.orders
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
              col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_count"),
        sum(when(!high, 1).otherwise(0)).as("low_count"))
      .orderBy(col("l_linestatus"))
  }

  /** STDDEV/VAR via the sum/count rewrite (reference
    * AggregateReduceFunctionsRule / WindowAggregateReduceFunctionsRule —
    * SURVEY §2.4): exact integer/decimal sums make the result independent
    * of partial-aggregation merge order, unlike streaming-moment
    * implementations. */
  val q67StatsRewrite: QueryDef = QueryDef("q67_stats_rewrite",
    """SELECT l_returnflag,
      |  COUNT(*) AS n,
      |  SUM(l_quantity) AS s1,
      |  SUM(l_quantity * l_quantity) AS s2,
      |  (SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(*)) / (COUNT(*) - 1) AS var_samp_q,
      |  (SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(*)) / COUNT(*) AS var_pop_q,
      |  sqrt((SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(*)) / (COUNT(*) - 1)) AS stddev_samp_q
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val s1 = sum(col("l_quantity"))
    val s2 = sum(col("l_quantity") * col("l_quantity"))
    val n = count(lit(1))
    val varSamp = (s2 - s1 * s1 / n) / (n - 1)
    val varPop = (s2 - s1 * s1 / n) / n
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(n.as("n"), s1.as("s1"), s2.as("s2"),
        varSamp.as("var_samp_q"), varPop.as("var_pop_q"),
        sqrt(varSamp).as("stddev_samp_q"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q18 shape: customers holding orders whose total quantity
    * exceeds a threshold (aggregation subquery feeding a semi join). */
  val q68BigOrders: QueryDef = QueryDef("q68_big_orders",
    """SELECT c_custkey, o_orderkey, o_totalprice, t.total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING SUM(l_quantity) > 210) t
      |  ON o_orderkey = t.l_orderkey
      |ORDER BY t.total_qty DESC, o_orderkey
      |LIMIT 50""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val big = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 210)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  /** Decimal arithmetic semantics (SURVEY §7.4 risk item — reference
    * DecimalITCase; Spark's `decimalOperations.allowPrecisionLoss` and
    * widening rules differ from other engines): every operation carries an
    * explicit result cast, the discipline that makes money arithmetic
    * engine-portable. Division happens in decimal with a pinned scale;
    * the final values leave as DOUBLE. */
  val q75DecimalEdge: QueryDef = QueryDef("q75_decimal_edge",
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(19,2))) AS DOUBLE) AS sum_add,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(24,4))) AS DOUBLE) AS sum_mul,
      |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_p,
      |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_p,
      |  round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(30,2)) / CAST(COUNT(*) AS DECIMAL(19,0)) AS DOUBLE), 4) AS avg_div
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val p = col("l_extendedprice").cast(DecimalType(18, 2))
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        sum((p + col("l_tax").cast(DecimalType(18, 2))).cast(DecimalType(19, 2)))
          .cast(DoubleType).as("sum_add"),
        sum((p * col("l_discount").cast(DecimalType(18, 2))).cast(DecimalType(24, 4)))
          .cast(DoubleType).as("sum_mul"),
        min(p).cast(DoubleType).as("min_p"),
        max(p).cast(DoubleType).as("max_p"),
        // engines assign different scales to decimal division results
        // (Spark's allowPrecisionLoss vs DuckDB's rules) — compare at 4dp
        round((sum(p).cast(DecimalType(30, 2)) / count(lit(1)).cast(DecimalType(19, 0)))
          .cast(DoubleType), 4).as("avg_div"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact interpolated percentiles (SQL PERCENTILE_CONT; DuckDB
    * quantile_cont uses the same linear interpolation — compared at 6dp
    * to absorb interpolation-arithmetic ulps). At 100 TB scale exact
    * percentiles become approx_percentile; kept exact here because the
    * gate demands a hash match. */
  val q82Percentiles: QueryDef = QueryDef("q82_percentiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)"), 6).as("p50_qty"),
        round(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)"), 6).as("p90_qty"),
        round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 6).as("p50_price"))
      .orderBy(col("l_returnflag"))
  }
}
