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

  def defs: Seq[QueryDef] = Seq(q63AsOfJoin, q69IntervalJoin)

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
