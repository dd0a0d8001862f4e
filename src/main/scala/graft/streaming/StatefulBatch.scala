package graft.streaming

import org.apache.spark.sql.functions._

import graft.core.QueryDef

/** The stateful trio under the correctness gate: `flatMapGroupsWithState`
  * executes on batch Datasets too (one invocation per key, empty initial
  * state), where each operator's semantics collapse to a SQL-expressible
  * form — so the same code paths exercised by the streaming specs are also
  * hash-checked against DuckDB:
  *
  *  - top-n          → rank-by-value per key
  *  - keep-last      → latest row per key
  *  - running OVER   → SUM/COUNT/MAX OVER (… ROWS UNBOUNDED PRECEDING)
  *
  * The running aggregates are bit-deterministic because the operator sorts
  * each group's rows by (ts, event_id) before folding — the same sequence
  * the oracle's window frame accumulates in.
  */
object StatefulBatch {

  def defs: Seq[QueryDef] =
    Seq(q72TopnState, q73KeepLastState, q74RunningOver, q88TemporalJoinState)

  val q72TopnState: QueryDef = QueryDef("q72_topn_state",
    """SELECT user_id, rank, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY value DESC, event_id) AS rank
      |  FROM events) WHERE rank <= 3
      |ORDER BY user_id, rank""".stripMargin) { (spark, dir) =>
    StatefulOps.topNPerKey(StatefulOps.typedEvents(spark, dir), 3).toDF()
      .select(col("user_id"), col("rank"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("rank"))
  }

  val q73KeepLastState: QueryDef = QueryDef("q73_keep_last_state",
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
    StatefulOps.keepLastDedup(StatefulOps.typedEvents(spark, dir)).toDF()
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q74RunningOver: QueryDef = QueryDef("q74_running_over",
    """SELECT user_id, event_id,
      |  COUNT(*) OVER win AS running_count,
      |  round(SUM(value) OVER win, 4) AS running_sum,
      |  MAX(value) OVER win AS running_max
      |FROM events
      |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS UNBOUNDED PRECEDING)
      |ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    StatefulOps.runningAggregates(StatefulOps.typedEvents(spark, dir)).toDF()
      // DuckDB evaluates windowed SUM with a segment tree, so the double
      // association order differs from the operator's sequential fold in
      // the last ulp — compare at 4dp
      .select(col("user_id"), col("event_id"), col("running_count"),
        round(col("running_sum"), 4).as("running_sum"), col("running_max"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** The streaming temporal join (TemporalJoin.temporalJoin) collapsed to
    * batch, against the same ASOF oracle as the batch rewrite (q63) — one
    * operator, two execution modes, one answer. */
  val q88TemporalJoinState: QueryDef = QueryDef("q88_temporal_join_state",
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  CAST(p.value AS DOUBLE) AS purchase_value,
      |  v.event_id AS viewed_event, v.value AS viewed_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY purchase_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = StatefulOps.typedEvents(spark, dir)
    val facts = ev.filter(_.event_type == "purchase")
      .map(e => TemporalJoin.Fact(e.user_id, e.ts, e.event_id, e.value))
    val dims = ev.filter(_.event_type == "view")
      .map(e => TemporalJoin.DimVersion(e.user_id, e.ts, e.event_id, e.value))
    TemporalJoin.temporalJoin(facts, dims, delay = "0 seconds").toDF()
      .select(col("fact_id").as("purchase_id"), col("k").as("user_id"),
        col("fact_value").as("purchase_value"),
        col("dim_ver").as("viewed_event"), col("dim_value").as("viewed_value"))
      .orderBy(col("purchase_id"))
  }
}
