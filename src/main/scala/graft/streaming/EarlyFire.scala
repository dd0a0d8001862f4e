package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import StatefulOps.{Event, eventMicros}

/** Early-fire windowed aggregation — the reference's per-window emit
  * strategy as a real operator with its knobs, not an output-mode
  * approximation (reference: PB/plan/utils/WindowEmitStrategy.scala:155-193 —
  * `table.exec.emit.early-fire.enabled` / `early-fire.delay`; runtime
  * triggers RT/operators/window/triggers/EventTimeTriggers.java and
  * ProcessingTimeTriggers.java compose "element count / proc-time interval
  * before watermark, watermark at end").
  *
  * Semantics: tumbling event-time windows per key; while a window is open,
  * the CURRENT partial aggregate is emitted at most once per
  * `earlyFire` of processing time (and only when it changed — the
  * reference's trigger fires on the same condition); when the watermark
  * passes the window end the FINAL aggregate is emitted, tagged
  * `is_final = 1`, and the window's state is dropped. Rows later than the
  * watermark delay are dropped by the watermark filter, exactly as the
  * reference drops elements past allowed lateness.
  *
  * Execution: `flatMapGroupsWithState` keyed by (key, window-start) with a
  * PROCESSING-time timeout as the early-fire clock; window close is
  * adjudicated against the event-time watermark on each firing — Spark
  * gives an operator one timer family, so the proc-time timer doubles as
  * the close poll (the close is detected at most one `earlyFire` interval
  * after the watermark passes, a bounded delay the reference's two-timer
  * service does not pay; the FINAL content is identical). Like every
  * proc-time-timer operator here, the open-window timers make Spark
  * schedule micro-batches while windows are open — state is O(1) per open
  * window and zero after close. (Those continuous timer batches also mean
  * `StreamingQuery.processAllAvailable` may never observe quiescence
  * while a window is open — poll the sink instead.)
  *
  * Batch collapse: one invocation per (key, window), no watermark — the
  * operator emits exactly the final rows, which is what the DuckDB oracle
  * (plain tumbling GROUP BY) hash-checks.
  */
object EarlyFire {

  /** One emission: a partial (`is_final = 0`) or the closing final
    * (`is_final = 1`) of a window. `w_start_us` is the window start in
    * epoch micros (int on both engines — see the parity notes on
    * timestamps). */
  case class WindowFire(user_id: Long, w_start_us: Long, n_events: Long,
      sum_value: Double, is_final: Int)

  /** Per-open-window state: running aggregate + the count at the last
    * emission (suppresses unchanged re-fires). */
  case class WinAgg(n: Long, sum: Double, emittedN: Long)

  /** Per-open-window late-fire state: running aggregate, the count at the
    * last emission, and whether the window's first final has fired. */
  case class LateWinAgg(n: Long, sum: Double, emittedN: Long, closed: Boolean)

  /** Tumbling-window aggregation with ALLOWED LATENESS: after the
    * watermark closes a window the final fires as usual, but the window's
    * aggregate is RETAINED for a further `allowedLateness` horizon, and
    * any row arriving inside that horizon re-emits an updated final
    * (`is_final = 2` — the reference's late firing). Once the horizon
    * passes, state is dropped and later rows are discarded. (reference:
    * PB/plan/utils/WindowEmitStrategy.scala:155-193 late-fire knobs;
    * RT/operators/window/triggers/EventTimeTriggers.java
    * `AfterEndOfWindow#withLateFirings`; WindowOperator's
    * `allowedLateness` cleanup timer.)
    *
    * Execution: Spark's watermark delay is set to `delay +
    * allowedLateness` so rows up to that late still reach the operator —
    * the TRUE close watermark is then `sparkWatermark + allowedLateness`
    * (= maxTs - delay, exactly the reference's watermark), and the Spark
    * watermark IS the retention horizon: once it passes the window end
    * the operator discards the group's rows and state in one branch
    * (flatMapGroupsWithState does not itself filter below-watermark
    * input, so the allowed-lateness drop is enforced in the operator),
    * and no second timer family is needed. Late finals emit on arrival
    * (late-fire interval 0, the tightest setting of the reference's
    * late-fire delay knob).
    *
    * Batch collapse: every row folds before the single emission, so the
    * output is exactly the plain tumbling aggregate with `is_final = 1`
    * (what the DuckDB oracle hash-checks); the partial → final →
    * late-final sequence is asserted by the streaming spec. */
  def lateFireWindowAgg(events: Dataset[Event], window: java.time.Duration,
      earlyFire: String = "1 second", delay: java.time.Duration,
      allowedLateness: java.time.Duration): Dataset[WindowFire] = {
    val winUs = window.toNanos / 1000
    val lateUs = allowedLateness.toNanos / 1000
    require(winUs > 0, s"window size must be positive, got $window")
    require(lateUs >= 0, s"allowedLateness must be >= 0, got $allowedLateness")
    val isBatch = !events.isStreaming
    implicit val outEnc = Encoders.product[WindowFire]
    implicit val stEnc = Encoders.product[LateWinAgg]
    val wmDelay = s"${(delay.toNanos / 1000 + lateUs) / 1000} milliseconds"
    events
      .withWatermark("ts", wmDelay)
      .groupByKey { e =>
        val us = eventMicros(e.ts)
        (e.user_id, us - math.floorMod(us, winUs))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        (key: (Long, Long), rows: Iterator[Event], state: GroupState[LateWinAgg]) => {
          val (user, wStartUs) = key
          var s = state.getOption.getOrElse(LateWinAgg(0L, 0.0, 0L, closed = false))
          rows.toSeq.sortBy(e => (eventMicros(e.ts), e.event_id))
            .foreach(e => s = s.copy(n = s.n + 1, sum = s.sum + e.value))
          if (isBatch) Iterator.single(WindowFire(user, wStartUs, s.n, s.sum, 1))
          else {
            val sparkWmUs = state.getCurrentWatermarkMs() * 1000L
            val trueWmUs = sparkWmUs + lateUs
            val wEndUs = wStartUs + winUs
            if (sparkWmUs >= wEndUs) {
              // retention horizon passed: discard any (late-arriving)
              // rows and drop whatever state remains. Spark's
              // flatMapGroupsWithState does not itself filter
              // below-watermark input rows, so the horizon is enforced
              // here — this branch IS the allowed-lateness drop.
              if (state.exists) state.remove()
              Iterator.empty
            } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[WindowFire]
            if (!s.closed && trueWmUs >= wEndUs) {
              // the reference watermark passed the end: first final
              s = s.copy(emittedN = s.n, closed = true)
              out += WindowFire(user, wStartUs, s.n, s.sum, 1)
            } else if (s.closed && s.n != s.emittedN) {
              // late row(s) inside the allowed-lateness horizon
              s = s.copy(emittedN = s.n)
              out += WindowFire(user, wStartUs, s.n, s.sum, 2)
            } else if (!s.closed && state.hasTimedOut && s.n != s.emittedN) {
              // open window: early fire on the interval timer
              s = s.copy(emittedN = s.n)
              out += WindowFire(user, wStartUs, s.n, s.sum, 0)
            }
            state.update(s)
            state.setTimeoutDuration(earlyFire)
            out.iterator
            }
          }
        })
  }

  /** Tumbling-window count/sum per key with early fires every `earlyFire`
    * of processing time and a final on watermark close. */
  def earlyFireWindowAgg(events: Dataset[Event], window: java.time.Duration,
      earlyFire: String = "1 second",
      delay: String = "0 seconds"): Dataset[WindowFire] = {
    val winUs = window.toNanos / 1000
    require(winUs > 0, s"window size must be positive, got $window")
    val isBatch = !events.isStreaming
    implicit val outEnc = Encoders.product[WindowFire]
    implicit val stEnc = Encoders.product[WinAgg]
    events
      .withWatermark("ts", delay)
      .groupByKey { e =>
        val us = eventMicros(e.ts)
        (e.user_id, us - math.floorMod(us, winUs))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        (key: (Long, Long), rows: Iterator[Event], state: GroupState[WinAgg]) => {
          val (user, wStartUs) = key
          var s = state.getOption.getOrElse(WinAgg(0L, 0.0, 0L))
          // fold in (ts, event_id) order: the double sum is then the same
          // association order on every run (and in both execution modes)
          rows.toSeq.sortBy(e => (eventMicros(e.ts), e.event_id))
            .foreach(e => s = WinAgg(s.n + 1, s.sum + e.value, s.emittedN))
          if (isBatch) Iterator.single(WindowFire(user, wStartUs, s.n, s.sum, 1))
          else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            if (state.hasTimedOut && wmUs >= wStartUs + winUs) {
              // window closed: final fire, state dropped
              state.remove()
              Iterator.single(WindowFire(user, wStartUs, s.n, s.sum, 1))
            } else {
              // open window: early fire on the interval timer, and only
              // when the aggregate changed since the last emission
              val fire = state.hasTimedOut && s.n != s.emittedN
              if (fire) s = s.copy(emittedN = s.n)
              state.update(s)
              state.setTimeoutDuration(earlyFire)
              if (fire)
                Iterator.single(WindowFire(user, wStartUs, s.n, s.sum, 0))
              else Iterator.empty
            }
          }
        })
  }
}
