package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import OverAggregates.{Acc, Agg}

/** Early-fire / late-fire tumbling-window aggregation over an ARBITRARY
  * DataFrame — the general-schema twin of [[EarlyFire]], the same
  * generalization move [[OverAggregates]] made for streaming OVER
  * (reference: the emit strategy applies to any windowed aggregate on any
  * registered table — flink-table-planner-blink
  * PB/plan/utils/WindowEmitStrategy.scala:155-193,
  * `table.exec.emit.early-fire.*` / `late-fire.*`; runtime triggers
  * RT/operators/window/triggers/EventTimeTriggers.java
  * `AfterEndOfWindow#withEarlyFirings/withLateFirings`; the Event-typed
  * [[EarlyFire]] operators remain the spec'd fixed-schema fast path).
  *
  * Semantics, per (partCols, tumbling window of `window` on `tsCol`):
  *
  *  - while the window is OPEN, the current partial aggregate emits at
  *    most once per `earlyFire` of processing time, and only when it
  *    changed (`is_final = 0` — the reference's early-fire trigger);
  *  - when the event-time watermark passes the window end, the FINAL
  *    emits (`is_final = 1`) — guaranteed exactly once per non-empty
  *    window even when one micro-batch jumps the watermark past the
  *    whole retention horizon (a hole the Event-typed operator accepts);
  *  - rows arriving within `allowedLateness` after the close re-emit an
  *    updated final (`is_final = 2` — the reference's late firing, at
  *    its tightest late-fire delay of 0); once the horizon passes, state
  *    drops and later rows are discarded.
  *
  * Aggregates are the [[OverAggregates.Agg]] surface: COUNT(*)/COUNT(col)
  * /SUM/MIN/MAX/AVG with SQL null-skipping, decimal-exact arithmetic on
  * DECIMAL inputs, and DISTINCT (the reference's DistinctView family —
  * per-window distinct-value sets, insert-only, exactly the reference's
  * state cost; MIN/MAX(DISTINCT) normalize to the plain aggregates).
  *
  * Output: the partition columns, `w_start_us` (window start in epoch
  * micros), one column per agg, `is_final` int.
  *
  * Execution: `flatMapGroupsWithState` keyed by (partCols, window-start)
  * with a PROCESSING-time timeout as the early-fire clock; window close
  * is adjudicated against the event-time watermark on each firing (Spark
  * gives an operator one timer family — the close lands at most one
  * `earlyFire` interval after the watermark passes, a bounded delay; the
  * FINAL content is identical). Spark's watermark delay is set to
  * `delay + allowedLateness`, so the TRUE close watermark is
  * `sparkWatermark + allowedLateness` (= maxTs − delay, exactly the
  * reference's watermark) and the Spark watermark IS the retention
  * horizon. State per open window is O(aggs) (+ distinct sets when
  * DISTINCT aggs are present) and zero after the horizon.
  *
  * Scale: one shuffle on (partCols, window-start) — the same bound as
  * Spark's own streaming window aggregate and the reference's
  * WindowOperator; open-window timers make Spark schedule micro-batches
  * while windows are open (poll the sink, not processAllAvailable).
  *
  * Batch collapse: one invocation per (key, window), no watermark — the
  * operator emits exactly the final rows (the plain tumbling aggregate),
  * which is what the DuckDB oracle hash-checks; the partial → final →
  * late-final sequence is pinned by `WindowAggAnySpec`.
  */
object WindowAggAny {

  /** Per-open-window state: row count, running accumulators, per-agg
    * distinct-value sets, the row count at the last emission (suppresses
    * unchanged re-fires), and whether the first final fired.
    * Java-serialized for the same JPMS reason as [[OverAggregates]]. */
  final case class WinState(rows: Long, accs: Seq[Acc],
      dsets: Seq[Set[Any]], emittedRows: Long, closed: Boolean)

  def earlyLateFireWindowAgg(df: DataFrame, partCols: Seq[String],
      tsCol: String, tieBreak: Seq[String], window: java.time.Duration,
      aggs0: Seq[Agg], earlyFire: String = "1 second",
      delay: java.time.Duration = java.time.Duration.ZERO,
      allowedLateness: java.time.Duration = java.time.Duration.ZERO)
      : DataFrame = {
    val aggs = OverAggregates.normalizeAggs(aggs0)
    val winUs = window.toNanos / 1000
    val lateUs = allowedLateness.toNanos / 1000
    require(winUs > 0, s"window size must be positive, got $window")
    require(lateUs >= 0, s"allowedLateness must be >= 0, got $allowedLateness")
    require(!delay.isNegative, s"delay must be >= 0, got $delay")
    require(aggs.nonEmpty, "at least one window aggregate is required")
    val schema = df.schema
    val isStreaming = df.isStreaming
    (partCols ++ tieBreak :+ tsCol).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"column '$c' not in input schema ${schema.fieldNames.mkString(", ")}"))
    val tsIdx = schema.fieldIndex(tsCol)
    require(schema.fields(tsIdx).dataType == TimestampType,
      s"the window column must be a timestamp, got " +
        s"${schema.fields(tsIdx).dataType}")
    tieBreak.foreach(c => OverAggregates.requireOrderable(schema, c))
    val aggIdx = OverAggregates.checkAggs(schema, aggs)
    val partIdx = partCols.map(schema.fieldIndex)
    val outSchema = StructType(
      partIdx.map(schema.fields(_)) ++
        Seq(StructField("w_start_us", LongType, nullable = false)) ++
        OverAggregates.outFields(aggs, aggIdx) :+
        StructField("is_final", IntegerType, nullable = false))
    val outEnc: Encoder[Row] = Encoders.row(outSchema)
    implicit val stEnc: Encoder[WinState] = Encoders.javaSerialization[WinState]
    // key = partition values + window start micros
    val keySchema = StructType(partIdx.map(schema.fields(_)) :+
      StructField("w_start_us", LongType, nullable = false))
    val keyEnc: Encoder[Row] = Encoders.row(keySchema)
    def rowUs(r: Row): Long =
      StatefulOps.eventMicros(r.getAs[java.sql.Timestamp](tsIdx))
    // deterministic fold order within one invocation: the double sum must
    // not depend on post-shuffle arrival order
    val ord = OverAggregates.seqOrdering(tsIdx +: tieBreak.map(schema.fieldIndex))
    val empty = WinState(0L, OverAggregates.emptyAccs(aggs),
      OverAggregates.emptyDsets(aggs), 0L, closed = false)
    val wmDelay = s"${(delay.toNanos / 1000 + lateUs) / 1000} milliseconds"

    def process(key: Row, rows: Iterator[Row], state: GroupState[WinState])
        : Iterator[Row] = {
      val wStartUs = key.getLong(key.length - 1)
      val keyVals = (0 until key.length - 1).map(key.get)
      def emit(s: WinState, isFinal: Int): Row = Row.fromSeq(
        keyVals ++ Seq(wStartUs) ++
          OverAggregates.accOutputs(aggs, s.rows, s.accs, s.dsets) :+ isFinal)
      var s = state.getOption.getOrElse(empty)
      val sparkWmUs =
        if (!isStreaming) Long.MinValue
        else state.getCurrentWatermarkMs() * 1000L
      val wEndUs = wStartUs + winUs
      val horizonPassed = isStreaming && sparkWmUs >= wEndUs
      if (!horizonPassed)
        rows.map(_.toSeq).toSeq.sorted(ord).foreach { vals =>
          val e = OverAggregates.entryOfVals(vals, aggIdx)
          s = WinState(s.rows + 1, OverAggregates.updateAccs(aggs, s.accs, e),
            OverAggregates.updateDsets(aggs, s.dsets, e), s.emittedRows,
            s.closed)
        }
      if (!isStreaming) Iterator.single(emit(s, 1))
      else if (horizonPassed) {
        // retention horizon passed: rows in this batch are beyond allowed
        // lateness and are discarded (flatMapGroupsWithState does not
        // itself filter them — this branch IS the allowed-lateness drop);
        // if the final never fired (one micro-batch can jump the
        // watermark past close AND horizon), fire it on the way out
        val out =
          if (!s.closed && s.rows > 0) Iterator.single(emit(s, 1))
          else Iterator.empty
        if (state.exists) state.remove()
        out
      } else {
        val trueWmUs = sparkWmUs + lateUs
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        if (!s.closed && trueWmUs >= wEndUs) {
          // the reference watermark passed the window end: first final
          s = s.copy(emittedRows = s.rows, closed = true)
          out += emit(s, 1)
        } else if (s.closed && s.rows != s.emittedRows) {
          // late row(s) inside the allowed-lateness horizon
          s = s.copy(emittedRows = s.rows)
          out += emit(s, 2)
        } else if (!s.closed && state.hasTimedOut && s.rows != s.emittedRows) {
          // open window: early fire on the interval timer
          s = s.copy(emittedRows = s.rows)
          out += emit(s, 0)
        }
        state.update(s)
        state.setTimeoutDuration(earlyFire)
        out.iterator
      }
    }

    df.withWatermark(tsCol, wmDelay)
      .groupByKey { r =>
        val us = rowUs(r)
        Row.fromSeq(partIdx.map(r.get) :+
          (us - math.floorMod(us, winUs)))
      }(keyEnc)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(process)(stEnc, outEnc)
  }
}
