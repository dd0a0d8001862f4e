package graft.operators

import org.apache.spark.sql.functions.col

import graft.core.QueryDef
import graft.streaming.{MatchRecognizeSql, StatefulOps}

/** The reference's MATCH_RECOGNIZE shapes accepted AS SQL TEXT
  * (reference: flink-table-planner-blink StreamExecMatch.scala:68,
  * MatchCodeGenerator.scala:82, MatchRecognizeITCase grammar surface)
  * through [[graft.streaming.MatchRecognizeSql]], each hash-checked by
  * the SAME DuckDB oracle as its Scala-API twin in [[Funnel]] — so the
  * SQL front-end is verified to produce bit-identical results to the
  * API it rewrites onto, and a reference user can paste the clause
  * instead of building [[graft.streaming.PatternMatch.Step]]s. */
object MatchSql {

  def defs: Seq[QueryDef] =
    Seq(q125SqlFunnel, q126SqlPrev, q127SqlReluctant, q128SqlNext,
      q129SqlSkipNext, q130SqlAllRows)

  private def run(sql: String)(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    MatchRecognizeSql.sql(StatefulOps.typedEvents(spark, dir), sql)

  /** q89's funnel (`A B+ C`, FIRST/LAST/COUNT measures) as SQL text. */
  val q125SqlFunnel: QueryDef = QueryDef("q125_sql_match_funnel",
    Funnel.q89MatchRecognize.oracle.get) { (spark, dir) =>
    run("""SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  MEASURES A.event_id AS view_id,
          |           FIRST(B.event_id) AS first_click,
          |           LAST(B.event_id) AS last_click,
          |           COUNT(B.*) AS n_clicks,
          |           C.event_id AS purchase_id
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (A B+ C)
          |  DEFINE A AS event_type = 'view',
          |         B AS event_type = 'click',
          |         C AS event_type = 'purchase'
          |)""".stripMargin)(spark, dir)
      .orderBy(col("user_id"), col("purchase_id"))
  }

  /** q96's PREV-DEFINE price "V" (`D+ U`, D: value < PREV(value)). */
  val q126SqlPrev: QueryDef = QueryDef("q126_sql_match_prev",
    Funnel.q96PrevDefine.oracle.get) { (spark, dir) =>
    run("""SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  MEASURES FIRST(D.event_id) AS first_down,
          |           LAST(D.event_id) AS last_down,
          |           COUNT(D.*) AS n_down,
          |           U.event_id AS rebound
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (D+ U)
          |  DEFINE D AS value < PREV(value),
          |         U AS value > PREV(value)
          |)""".stripMargin)(spark, dir)
      .orderBy(col("user_id"), col("first_down"))
  }

  /** q98's reluctant star (`V A*? C`): nearest following click. */
  val q127SqlReluctant: QueryDef = QueryDef("q127_sql_match_reluctant",
    Funnel.q98ReluctantMatch.oracle.get) { (spark, dir) =>
    run("""SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  MEASURES V.event_id AS view_id,
          |           C.event_id AS click_id,
          |           COUNT(A.*) AS n_between
          |  ONE ROW PER MATCH
          |  PATTERN (V A*? C)
          |  DEFINE V AS event_type = 'view',
          |         C AS event_type = 'click'
          |)""".stripMargin)(spark, dir)
      .orderBy(col("user_id"), col("view_id"))
  }

  /** q99's NEXT-DEFINE (`A` with NEXT(event_type) = 'purchase'). */
  val q128SqlNext: QueryDef = QueryDef("q128_sql_match_next",
    Funnel.q99NextDefine.oracle.get) { (spark, dir) =>
    run("""SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  MEASURES A.event_id AS view_id,
          |           A.value AS viewed_value
          |  ONE ROW PER MATCH
          |  PATTERN (A)
          |  DEFINE A AS event_type = 'view' AND NEXT(event_type) = 'purchase'
          |)""".stripMargin)(spark, dir)
      .orderBy(col("user_id"), col("view_id"))
  }

  /** q111's overlapping pairs (`P1 P2`, AFTER MATCH SKIP TO NEXT ROW). */
  val q129SqlSkipNext: QueryDef = QueryDef("q129_sql_match_skip_next",
    Funnel.q111SkipToNextRow.oracle.get) { (spark, dir) =>
    run("""SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  MEASURES P1.event_id AS first_purchase,
          |           P2.event_id AS second_purchase
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP TO NEXT ROW
          |  PATTERN (P1 P2)
          |  DEFINE P1 AS event_type = 'purchase',
          |         P2 AS event_type = 'purchase'
          |)""".stripMargin)(spark, dir)
      .orderBy(col("user_id"), col("first_purchase"))
  }

  /** q113's ALL ROWS PER MATCH with the canonical CLASSIFIER() /
    * MATCH_NUMBER() / RUNNING-vs-FINAL projection. */
  val q130SqlAllRows: QueryDef = QueryDef("q130_sql_match_all_rows",
    Funnel.q113AllRows.oracle.get) { (spark, dir) =>
    run("""SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  ALL ROWS PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (A B+ C)
          |  DEFINE A AS event_type = 'view',
          |         B AS event_type = 'click',
          |         C AS event_type = 'purchase'
          |)""".stripMargin)(spark, dir)
      .orderBy(col("user_id"), col("match_no"), col("pos"))
  }
}
