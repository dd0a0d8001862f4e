package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Catalog, QueryDef, Tables}

/** Group-window aggregations (SURVEY.md §2.9 — reference
  * WindowOperator.java:97 with Tumbling/Sliding/SessionWindowAssigner):
  * tumble, hop and session windows over the `events` table, expressed with
  * Spark's `window`/`session_window` grouping expressions. The same
  * expressions run unchanged under Structured Streaming with a watermark
  * (see graft.streaming specs); here they run batch so the DuckDB oracle
  * can check them.
  *
  * `events.ts` arrives as a true microsecond TimestampType ([[Catalog.load]]
  * normalizes the footer unit), so both engines see identical instants.
  */
object Windows {

  def defs: Seq[QueryDef] =
    Seq(q60Tumble, q61Hop, q62Session, q108DynamicSession,
      q145CountTumbleAny, q146CountSlideAny, q149CountTumbleNative,
      q162SqlTumble, q163SqlHop, q164SqlSession, q181SqlProcTumble)

  /** The BATCH-NATIVE route of the count-tumble shape (r12): ROW_NUMBER
    * chunking + a native hash aggregate with map-side combine — the
    * 100 TB batch plan, where q145 pins the streaming executor's
    * collapse. Decimal sum keeps it bit-exact. */
  val q149CountTumbleNative: QueryDef = QueryDef("q149_count_tumble_native",
    """WITH seq AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_partkey, l_suppkey) - 1 AS rn
      |  FROM lineitem)
      |SELECT l_orderkey, rn // 4 AS win_seq, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
      |  MIN_BY(l_linenumber, rn) AS first_id, MAX_BY(l_linenumber, rn) AS last_id
      |FROM seq GROUP BY l_orderkey, rn // 4
      |HAVING COUNT(*) = 4
      |ORDER BY l_orderkey, win_seq""".stripMargin) { (spark, dir) =>
    val t = Catalog.load(spark, dir, "lineitem")
      .withColumn("qty", col("l_quantity").cast(DecimalType(18, 2)))
    graft.streaming.CountWindows.countTumbleBatchNative(t, Seq("l_orderkey"),
      Seq("l_linenumber", "l_partkey", "l_suppkey"), 4, "qty", "l_linenumber")
      .select(col("l_orderkey"), col("win_seq"), col("n_rows"),
        col("sum_v").cast("double").as("sum_v"),
        col("first_id"), col("last_id"))
      .orderBy(col("l_orderkey"), col("win_seq"))
  }

  /** GENERAL-SCHEMA count-tumbling windows (r12 — the last §2.9 shape
    * that was Event-typed; reference CountTumblingWindowAssigner.java):
    * every 3 orders per customer in (o_orderdate, o_orderkey) order form
    * a window; only complete windows emit; the money sum folds in exact
    * decimal ([[graft.streaming.CountWindows]]), so the gate hashes
    * exact values. */
  val q145CountTumbleAny: QueryDef = QueryDef("q145_count_tumble_any",
    """WITH seq AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) - 1 AS rn
      |  FROM orders)
      |SELECT o_custkey, rn // 3 AS win_seq, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
      |  MIN_BY(o_orderkey, rn) AS first_id, MAX_BY(o_orderkey, rn) AS last_id
      |FROM seq GROUP BY o_custkey, rn // 3
      |HAVING COUNT(*) = 3
      |ORDER BY o_custkey, win_seq""".stripMargin) { (spark, dir) =>
    val t = Catalog.load(spark, dir, "orders")
      .withColumn("price", col("o_totalprice").cast(DecimalType(18, 2)))
    graft.streaming.CountWindows.countTumble(t, Seq("o_custkey"),
      Seq("o_orderdate", "o_orderkey"), 3, "price", "o_orderkey")
      .select(col("o_custkey"), col("win_seq"), col("n_rows"),
        col("sum_v").cast("double").as("sum_v"),
        col("first_id"), col("last_id"))
      .orderBy(col("o_custkey"), col("win_seq"))
  }

  /** General-schema count-sliding windows (reference
    * CountSlidingWindowAssigner.java): per order, a window of the 4 most
    * recent lines completes at every 2nd line once 4 have arrived. */
  val q146CountSlideAny: QueryDef = QueryDef("q146_count_slide_any",
    """WITH seq AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
      |  FROM lineitem)
      |SELECT s.l_orderkey, CAST((s.rn - 4) / 2 AS BIGINT) AS win_seq,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(w.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
      |  MIN_BY(w.l_linenumber, w.rn) AS first_id,
      |  MAX_BY(w.l_linenumber, w.rn) AS last_id
      |FROM seq s JOIN seq w
      |  ON w.l_orderkey = s.l_orderkey AND w.rn BETWEEN s.rn - 3 AND s.rn
      |WHERE s.rn >= 4 AND (s.rn - 4) % 2 = 0
      |GROUP BY s.l_orderkey, s.rn
      |ORDER BY s.l_orderkey, win_seq""".stripMargin) { (spark, dir) =>
    val t = Catalog.load(spark, dir, "lineitem")
      .withColumn("qty", col("l_quantity").cast(DecimalType(18, 2)))
    // (l_linenumber, l_partkey, l_suppkey) is the fixture's total order
    // within an order — bare l_linenumber repeats (up to 6x), and a tied
    // ROW_NUMBER draws nondeterministic window contents on both engines
    graft.streaming.CountWindows.countSlide(t, Seq("l_orderkey"),
      Seq("l_linenumber", "l_partkey", "l_suppkey"), 4, 2, "qty", "l_linenumber")
      .select(col("l_orderkey"), col("win_seq"), col("n_rows"),
        col("sum_v").cast("double").as("sum_v"),
        col("first_id"), col("last_id"))
      .orderBy(col("l_orderkey"), col("win_seq"))
  }

  private val tsCol = col("ts")

  /** 1-hour tumbling windows per event type (reference
    * TumblingWindowAssigner.java:34). */
  val q60Tumble: QueryDef = QueryDef("q60_tumble",
    """SELECT time_bucket(INTERVAL 1 HOUR, make_timestamp(epoch_us(ts))) AS w_start,
      |  event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.events
      .groupBy(window(tsCol, "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))
      .orderBy(col("w_start"), col("event_type"))
  }

  /** 1-hour windows sliding every 30 minutes (reference
    * SlidingWindowAssigner.java:40); the oracle unions the two candidate
    * window starts per row — a row at time t belongs to the windows
    * starting at bucket30(t) and bucket30(t) - 30 min. */
  val q61Hop: QueryDef = QueryDef("q61_hop",
    """WITH placed AS (
      |  SELECT time_bucket(INTERVAL 30 MINUTE, make_timestamp(epoch_us(ts))) AS w_start, value
      |  FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL 30 MINUTE, make_timestamp(epoch_us(ts))) - INTERVAL 30 MINUTE, value
      |  FROM events)
      |SELECT w_start, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM placed
      |GROUP BY 1
      |ORDER BY w_start""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.events
      .groupBy(window(tsCol, "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(col("window.start").as("w_start"), col("n"), col("total"))
      .orderBy(col("w_start"))
  }

  /** Session windows with a 30-minute gap per user (reference
    * SessionWindowAssigner.java:37 + MergingWindowSet.java); the oracle
    * reproduces merge semantics with the lag-gap / running-count idiom:
    * a new session starts when the gap from the previous event is ≥ the
    * timeout. */
  val q62Session: QueryDef = QueryDef("q62_session",
    """WITH e AS (
      |  SELECT user_id, make_timestamp(epoch_us(ts)) AS t, value FROM events),
      |marked AS (
      |  SELECT user_id, t, value,
      |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
      |              >= INTERVAL 30 MINUTE
      |         OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM e),
      |sess AS (
      |  SELECT user_id, t, value,
      |    SUM(is_start) OVER (PARTITION BY user_id ORDER BY t
      |                        ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(t) AS session_start, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.events
      .withColumn("t", tsCol)
      .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
      .agg(min(col("t")).as("session_start"), count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(col("user_id"), col("session_start"), col("n"), col("total"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Dynamic-gap session windows (reference SessionWindowAssigner's
    * `withDynamicGap` — the per-event gap function): a purchase keeps the
    * session alive for 60 minutes, any other event for 15. Spark's
    * `session_window` takes the gap as an expression; an event extends
    * its session to `t + gap(event)`, sessions merge while the next
    * event starts before the running session end. The oracle restates
    * exactly that as an island detection over the running max of
    * per-event ends (a new session starts when `t` reaches every
    * previous end). */
  val q108DynamicSession: QueryDef = QueryDef("q108_dynamic_session",
    """WITH e AS (
      |  SELECT user_id, make_timestamp(epoch_us(ts)) AS t, value,
      |    make_timestamp(epoch_us(ts)) + CASE event_type
      |      WHEN 'purchase' THEN INTERVAL 60 MINUTE
      |      ELSE INTERVAL 15 MINUTE END AS ev_end
      |  FROM events),
      |marked AS (
      |  SELECT user_id, t, value,
      |    CASE WHEN max(ev_end) OVER (PARTITION BY user_id ORDER BY t
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |         OR t >= max(ev_end) OVER (PARTITION BY user_id ORDER BY t
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM e),
      |sess AS (
      |  SELECT user_id, t, value,
      |    SUM(is_start) OVER (PARTITION BY user_id ORDER BY t
      |                        ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(t) AS session_start, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.events
      .withColumn("t", tsCol)
      .groupBy(session_window(col("t"),
        when(col("event_type") === "purchase", "60 minutes")
          .otherwise("15 minutes")), col("user_id"))
      .agg(min(col("t")).as("session_start"), count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(col("user_id"), col("session_start"), col("n"), col("total"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** The reference's group-window SQL SPELLING through the single front
    * door (r13 — reference batch `WindowAggregateITCase.scala:59-64` for
    * the shape, auxiliaries incl. `TUMBLE_ROWTIME` = end − 1 ms):
    * `GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)` rewrites to Spark's
    * native `window()` grouping ([[graft.streaming.GroupWindowSql]]),
    * so the plan is the same two-phase hash aggregate q60 gets from the
    * DataFrame API — this entry pins the TEXT path end-to-end. */
  val q162SqlTumble: QueryDef = QueryDef("q162_sql_tumble",
    """WITH b AS (
      |  SELECT event_type,
      |    time_bucket(INTERVAL 1 HOUR, make_timestamp(epoch_us(ts))) AS w_start,
      |    value
      |  FROM events)
      |SELECT event_type, w_start,
      |  w_start + INTERVAL 1 HOUR AS w_end,
      |  w_start + INTERVAL 1 HOUR - INTERVAL 1 MILLISECOND AS w_rowtime,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM b
      |GROUP BY event_type, w_start
      |ORDER BY w_start, event_type""".stripMargin) { (spark, dir) =>
    graft.core.Catalog.load(spark, dir, "events")
      .createOrReplaceTempView("events")
    graft.Sql.sql(spark,
      """SELECT event_type,
        |  TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start,
        |  TUMBLE_END(ts, INTERVAL '1' HOUR) AS w_end,
        |  TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR) AS w_rowtime,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY event_type, TUMBLE(ts, INTERVAL '1' HOUR)
        |ORDER BY w_start, event_type""".stripMargin)
  }

  /** r16: the reference's PROC-TIME TUMBLE spelling through the front
    * door (stream `WindowAggregateITCase` proc-time cases; the r15
    * tested rejection for the TUMBLE assigner, now served) —
    * `GROUP BY TUMBLE(PROCTIME(), INTERVAL '1' HOUR), event_type`
    * routes to [[graft.streaming.ProcTimeWindows.procTumbleAgg]]. The
    * BATCH COLLAPSE is the oracle's structural check: one processing
    * instant means exactly ONE window per key, so the emitted rows are
    * the plain GROUP BY — hash-matching it pins full row coverage
    * (every input row in exactly one emitted window) and the one-window
    * collapse; exact window WIDTH and the streaming fire sequence are
    * pinned by `ProcTimeWindowsSpec` with an injected clock (wall-clock
    * starts are not oracle-checkable, so the statement never selects
    * them — `TUMBLE_START` on proc-time is a loud rejection). */
  val q181SqlProcTumble: QueryDef = QueryDef("q181_sql_proc_tumble",
    """SELECT event_type, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  min(value) AS min_value,
      |  round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    graft.core.Catalog.load(spark, dir, "events")
      .createOrReplaceTempView("events")
    val routed = graft.Sql.sql(spark,
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  MIN(value) AS min_value,
        |  SUM(value) AS sum_value
        |FROM events
        |GROUP BY TUMBLE(PROCTIME(), INTERVAL '1' HOUR), event_type""".stripMargin)
    routed.select(col("event_type"), col("n_events"), col("n_users"),
        col("min_value"), round(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** `HOP(ts, slide, size)` — the reference's slide-first argument order
    * (stream `WindowAggregateITCase.scala:71-84`) rewritten to Spark's
    * size-first `window(ts, size, slide)`; a row lands in size/slide
    * windows, here 2. */
  val q163SqlHop: QueryDef = QueryDef("q163_sql_hop",
    """WITH placed AS (
      |  SELECT time_bucket(INTERVAL 30 MINUTE, make_timestamp(epoch_us(ts))) AS w_start, value
      |  FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL 30 MINUTE, make_timestamp(epoch_us(ts))) - INTERVAL 30 MINUTE, value
      |  FROM events)
      |SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM placed
      |GROUP BY 1
      |ORDER BY w_start""".stripMargin) { (spark, dir) =>
    graft.core.Catalog.load(spark, dir, "events")
      .createOrReplaceTempView("events")
    graft.Sql.sql(spark,
      """SELECT
        |  HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS w_start,
        |  HOP_END(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS w_end,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)
        |ORDER BY w_start""".stripMargin)
  }

  /** `SESSION(ts, gap)` per user (reference stream
    * `WindowAggregateITCase.scala:122-135` — keyed SESSION with
    * SESSION_START/_ROWTIME auxiliaries; its batch planner REJECTS
    * session group windows, `batch/sql/agg/WindowAggregateITCase.scala:
    * 727-744` expects RuntimeException — graft serves the same SQL in
    * both modes): rewrites to Spark's `session_window`, whose
    * merged-session semantics (start = first event, end = last event +
    * gap) are the reference's `SessionWindowAssigner` +
    * `MergingWindowSet`. */
  val q164SqlSession: QueryDef = QueryDef("q164_sql_session",
    """WITH e AS (
      |  SELECT user_id, make_timestamp(epoch_us(ts)) AS t, value FROM events),
      |marked AS (
      |  SELECT user_id, t, value,
      |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
      |              >= INTERVAL 30 MINUTE
      |         OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM e),
      |sess AS (
      |  SELECT user_id, t, value,
      |    SUM(is_start) OVER (PARTITION BY user_id ORDER BY t
      |                        ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(t) AS s_start,
      |  max(t) + INTERVAL 30 MINUTE AS s_end,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, s_start""".stripMargin) { (spark, dir) =>
    graft.core.Catalog.load(spark, dir, "events")
      .createOrReplaceTempView("events")
    graft.Sql.sql(spark,
      """SELECT user_id,
        |  SESSION_START(ts, INTERVAL '30' MINUTE) AS s_start,
        |  SESSION_END(ts, INTERVAL '30' MINUTE) AS s_end,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)
        |ORDER BY user_id, s_start""".stripMargin)
  }
}
