package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Catalog, QueryDef, Tables}

/** Temporal / as-of join (SURVEY.md §2.3 — reference
  * TemporalRowTimeJoinOperator.java:71: enrich each left row with the
  * latest right-side version at or before its timestamp; §7.3 flags it as
  * custom work because Spark has no FOR SYSTEM_TIME AS OF executor).
  *
  * Implementation: the union–sort–last_value rewrite, not a range join.
  * Both sides are tagged and unioned, hash-partitioned by key and sorted
  * by (ts, side, version); `last(..., ignoreNulls)` over the running
  * window then carries the newest right-side values onto every left row.
  * One shuffle + one sort regardless of how many right versions precede
  * each left row — at 100 TB this beats the O(versions) fan-out of a
  * `l.ts >= r.ts` theta-join followed by a max-per-key reduction, which is
  * the naive plan Catalyst would pick for the direct formulation.
  */
object AsOfJoin {

  def defs: Seq[QueryDef] =
    Seq(q63AsOfJoin, q69IntervalJoin, q166SqlTemporalFn, q167SqlSystemTime)

  /** Register the purchases/view-history pair the temporal-SQL queries
    * share: a deduped (user_id, ts)-unique view history (the reference's
    * `createTemporalTableFunction` assumes unique version times per
    * key), exposed both as the function name `ViewHist` and as the
    * versioned table `graft_viewhist` for the FOR SYSTEM_TIME form. */
  private def registerTemporalFixtures(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val t = Tables(spark, dir)
    t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("graft_purch")
    t.events.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("viewed_event"),
        max_by(col("value"), col("event_id")).as("viewed_value"))
      .createOrReplaceTempView("graft_viewhist")
    graft.streaming.TemporalSql.registerTemporalFunction(
      "ViewHist", "graft_viewhist", "ts", "user_id")
    graft.streaming.TemporalSql.registerTemporalFunction(
      "graft_viewhist", "graft_viewhist", "ts", "user_id")
  }

  /** The reference's temporal-table-FUNCTION SQL spelling through the
    * single front door (r13 — stream `TemporalJoinITCase.scala:106-111`:
    * `Orders AS o, LATERAL TABLE (Rates(o.rowtime)) AS r WHERE r.k =
    * o.k`), rewritten by [[graft.streaming.TemporalSql]] to a versioned
    * equi-join; the oracle is DuckDB's own ASOF (inner) JOIN. */
  val q166SqlTemporalFn: QueryDef = QueryDef("q166_sql_temporal_fn",
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, ts, max(event_id) AS viewed_event,
      |    max_by(value, event_id) AS viewed_value
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
      |SELECT p.purchase_id, p.user_id, v.viewed_event, v.viewed_value
      |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.purchase_id""".stripMargin) { (spark, dir) =>
    registerTemporalFixtures(spark, dir)
    graft.Sql.sql(spark,
      """SELECT p.purchase_id, p.user_id, r.viewed_event, r.viewed_value
        |FROM graft_purch AS p,
        |  LATERAL TABLE (ViewHist(p.ts)) AS r
        |WHERE r.user_id = p.user_id
        |ORDER BY p.purchase_id""".stripMargin)
  }

  /** The `FOR SYSTEM_TIME AS OF` spelling over the same versioned
    * history (reference `TableSourceITCase.scala:366` syntax, here with
    * an event-time AS OF), aggregated by the enclosing SQL. */
  val q167SqlSystemTime: QueryDef = QueryDef("q167_sql_system_time",
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, ts, max(event_id) AS viewed_event,
      |    max_by(value, event_id) AS viewed_value
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
      |SELECT v.viewed_event, count(*) AS n_purchases
      |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |GROUP BY v.viewed_event
      |ORDER BY viewed_event""".stripMargin) { (spark, dir) =>
    registerTemporalFixtures(spark, dir)
    graft.Sql.sql(spark,
      """SELECT r.viewed_event AS viewed_event, COUNT(*) AS n_purchases
        |FROM graft_purch p
        |JOIN graft_viewhist FOR SYSTEM_TIME AS OF p.ts AS r
        |  ON r.user_id = p.user_id
        |GROUP BY r.viewed_event
        |ORDER BY viewed_event""".stripMargin)
  }

  /** Batch interval (time-bounded) join — reference
    * TimeBoundedStreamJoin.java / StreamExecWindowJoin.scala:51 semantics
    * on bounded data: count views per purchase from the same user within
    * the preceding 3 days. The user_id equality keeps this a sort-merge
    * join with the range as a residual condition — never a cross join.
    * The 3-day horizon is integer micros arithmetic over `unix_micros(ts)`
    * — the same integer math as the oracle's `INTERVAL 3 DAY` over
    * microsecond timestamps, so boundary decisions are identical. */
  val q69IntervalJoin: QueryDef = QueryDef("q69_interval_join",
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  count(v.event_id) AS n_recent_views
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id
      |  AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 3 DAY
      |GROUP BY p.event_id, p.user_id
      |ORDER BY purchase_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val micros3d = 3L * 24 * 3600 * 1000 * 1000
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        expr("unix_micros(ts)").as("p_ts"))
    val v = t.events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
        expr("unix_micros(ts)").as("v_ts"))
    p.join(v,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("p_ts") && col("v_ts") > col("p_ts") - micros3d,
        "left")
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(count(col("v_id")).as("n_recent_views"))
      .orderBy(col("purchase_id"))
  }

  /** Generic as-of join: for each row of `left`, attach `valueCols` from
    * the latest `right` row with the same `key` and `rightTs ≤ leftTs`
    * (inclusive; right ties broken by `rightTieBreak` — highest wins).
    * Left rows with no prior right row get NULLs (left-outer semantics).
    *
    * The carried values travel as ONE struct per right row, so every
    * output column comes from the same right-side version — per-column
    * `last(..., ignoreNulls)` would backfill a NULL field from an older
    * version, silently mixing rows.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightTieBreak: String,
      valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    // the internal tagging columns would silently shadow same-named user
    // columns through withColumn — fail fast instead of corrupting output
    val reserved = Set("_ts", "_side", "_ver", "_vals", "_carried")
    val clash = (left.columns ++ right.columns).filter(reserved).distinct
    require(clash.isEmpty,
      s"asOfJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename input column(s) ${clash.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val valsType = StructType(valueCols.map(c => right.schema(c)))
    val taggedLeft = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_ver", lit(Long.MaxValue))
      .withColumn("_vals", lit(null).cast(valsType))
    val taggedRight = right
      .select(col(key), col(rightTs).as("_ts"),
        col(rightTieBreak).cast("long").as("_ver"),
        struct(valueCols.map(col): _*).as("_vals"))
      .withColumn("_side", lit(0))
    val r2 = leftCols.filterNot(_ == key).foldLeft(taggedRight)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val shape = leftCols.map(col) ++ Seq(col("_ts"), col("_side"), col("_ver"), col("_vals"))
    val unioned = taggedLeft.select(shape: _*).unionByName(r2.select(shape: _*))
    // right rows sort before left rows at equal ts (inclusive as-of);
    // among right rows with equal ts the highest tie-break wins
    val w = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"), col("_ver"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .select((leftCols.map(col) :+ col("_side")) :+
        last(col("_vals"), ignoreNulls = true).over(w).as("_carried"): _*)
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("_carried").getField(c).as(c)): _*)
  }

  /** Enrich each purchase with the user's most recent view at or before
    * the purchase time (classic clickstream attribution shape). The as-of
    * ordering runs on `unix_micros(ts)` longs — exact integer comparison,
    * same instants the oracle's ASOF JOIN compares. */
  val q63AsOfJoin: QueryDef = QueryDef("q63_asof_join",
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  CAST(p.value AS DOUBLE) AS purchase_value,
      |  v.event_id AS viewed_event, v.value AS viewed_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY purchase_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("value").as("purchase_value"), expr("unix_micros(ts)").as("ts"))
    val views = t.events.filter(col("event_type") === "view")
      .select(col("user_id"), expr("unix_micros(ts)").as("ts"),
        col("event_id").as("viewed_event"), col("value").as("viewed_value"))
    asOfJoin(purchases, views, key = "user_id",
      leftTs = "ts", rightTs = "ts", rightTieBreak = "viewed_event",
      valueCols = Seq("viewed_event", "viewed_value"))
      .select(col("purchase_id"), col("user_id"), col("purchase_value"),
        col("viewed_event"), col("viewed_value"))
      .orderBy(col("purchase_id"))
  }
}
