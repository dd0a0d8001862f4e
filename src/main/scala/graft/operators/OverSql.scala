package graft.operators

import graft.core.QueryDef
import graft.streaming.{StatefulOps, StreamingOverSql}

/** The reference's streaming OVER-aggregate shapes accepted AS SQL TEXT
  * (reference: flink-table-planner-blink
  * .../stream/StreamExecOverAggregate.scala:56 routing; the
  * OverWindowITCase query surface) through
  * [[graft.streaming.StreamingOverSql]], each hash-checked by the SAME
  * DuckDB oracle as its Scala-API twin in
  * [[graft.streaming.StatefulBatch]] — the SQL front-end is thereby
  * proven bit-identical to the API it dispatches onto, closing the
  * SQL-vs-API asymmetry for the stateful OVER trio the way
  * [[MatchSql]] closed it for MATCH_RECOGNIZE. */
object OverSql {

  def defs: Seq[QueryDef] =
    Seq(q133SqlOverRunning, q134SqlOverRows, q135SqlOverRange)

  private def run(sql: String)(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    StreamingOverSql.sql(StatefulOps.typedEvents(spark, dir), sql)

  /** q74's unbounded running aggregates as SQL text — the oracle text
    * itself is the accepted statement (WINDOW clause, ROUND wrapper,
    * trailing ORDER BY all parse). */
  val q133SqlOverRunning: QueryDef = QueryDef("q133_sql_over_running",
    graft.streaming.StatefulBatch.q74RunningOver.oracle.get) { (spark, dir) =>
    run("""SELECT user_id, event_id,
          |  COUNT(*) OVER win AS running_count,
          |  ROUND(SUM(value) OVER win, 4) AS running_sum,
          |  MAX(value) OVER win AS running_max
          |FROM events
          |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
          |               ROWS UNBOUNDED PRECEDING)
          |ORDER BY user_id, event_id""".stripMargin)(spark, dir)
  }

  /** q94's `ROWS BETWEEN 4 PRECEDING AND CURRENT ROW` frame as SQL
    * text, inline-OVER form (reference
    * RowTimeRowsBoundedPrecedingFunction.java). */
  val q134SqlOverRows: QueryDef = QueryDef("q134_sql_over_rows",
    graft.streaming.StatefulBatch.q94RowsFrame.oracle.get) { (spark, dir) =>
    run("""SELECT user_id, event_id,
          |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
          |    AS n_in_frame,
          |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
          |    AS frame_sum,
          |  MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
          |    AS frame_max
          |FROM events
          |ORDER BY user_id, event_id""".stripMargin)(spark, dir)
  }

  /** q95's trailing-24h `RANGE BETWEEN ... PRECEDING` frame as SQL text
    * with the reference's INTERVAL bound (reference
    * RowTimeRangeBoundedPrecedingFunction.java; the oracle frames on the
    * same 86400000000 epoch-microseconds horizon). */
  val q135SqlOverRange: QueryDef = QueryDef("q135_sql_over_range",
    graft.streaming.StatefulBatch.q95RangeFrame.oracle.get) { (spark, dir) =>
    run("""SELECT user_id, event_id,
          |  COUNT(*) OVER win AS n_in_frame,
          |  ROUND(SUM(value) OVER win, 4) AS frame_sum,
          |  MAX(value) OVER win AS frame_max
          |FROM events
          |WINDOW win AS (PARTITION BY user_id ORDER BY ts
          |               RANGE BETWEEN INTERVAL '24' HOUR
          |                     PRECEDING AND CURRENT ROW)
          |ORDER BY user_id, event_id""".stripMargin)(spark, dir)
  }
}
