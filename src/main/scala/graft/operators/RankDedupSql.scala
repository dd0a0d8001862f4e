package graft.operators

import graft.core.QueryDef
import graft.streaming.RankSql

/** The reference's streaming TOP-N / DEDUPLICATION SQL patterns as
  * declared queries on NON-Event tables (reference:
  * StreamExecDeduplicateRule.scala's `ROW_NUMBER() = 1` routing and the
  * RankITCase / DeduplicateITCase `<= k` / `= k` surfaces), executed by
  * [[graft.streaming.RankOps.rankRows]] through [[RankSql.sqlDf]] and
  * hash-checked by DuckDB running the IDENTICAL statement — the batch
  * collapse of the streaming operator is the plain window query. */
object RankDedupSql {

  def defs: Seq[QueryDef] =
    Seq(q140KeepLastDedup, q141StreamTopN, q142TopNth)

  private def run(table: String, sql: String)(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    RankSql.sqlDf(graft.core.Catalog.load(spark, dir, table), sql)

  /** Keep-LAST dedup on the orders fact: each customer's most recent
    * order (latest o_orderdate, ties to the highest key — a total order,
    * so the streaming result is arrival-independent). The descending
    * ORDER BY is exactly what routes StreamExecDeduplicateRule to
    * keep-last (DeduplicateITCase.testLastRowOnProctime's shape, on a
    * value column). */
  val q140KeepLastDedup: QueryDef = QueryDef("q140_sql_keeplast_dedup",
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    run("orders",
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin)(spark, dir)
  }

  /** Streaming top-n on the orders fact: each customer's three priciest
    * orders WITH the rank column (RankITCase.testTopN's shape — outer
    * SELECT * keeps rank_num). */
  val q141StreamTopN: QueryDef = QueryDef("q141_sql_stream_topn",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (spark, dir) =>
    run("orders",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin)(spark, dir)
  }

  /** The k-th-row shape (RankITCase.testTopNth: `rank_num = 2`): every
    * order's second-priciest line, composite partition-free total order
    * via the line number tie-break. */
  val q142TopNth: QueryDef = QueryDef("q142_sql_topnth",
    """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
      |  FROM lineitem)
      |WHERE rn = 2
      |ORDER BY l_orderkey""".stripMargin) { (spark, dir) =>
    run("lineitem",
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem)
        |WHERE rn = 2
        |ORDER BY l_orderkey""".stripMargin)(spark, dir)
  }
}
