package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StatefulOps.Event

/** Quantified MATCH_RECOGNIZE subset — a real per-key NFA, not a lead()
  * rewrite (reference: StreamExecMatch.scala:68 + MatchCodeGenerator.scala:82
  * compile DEFINE/PATTERN to a codegen'd NFA; the fixed-pattern and
  * `view* purchase` shapes are already covered by [[graft.operators.Funnel]]).
  *
  * Supported grammar: a PATTERN is a sequence of steps, each a named
  * row-predicate with a quantifier — `A` (exactly one), `A?`, `A+`, `A*` —
  * matched GREEDILY with backtracking over each key's event-time-ordered
  * sequence, `AFTER MATCH SKIP PAST LAST ROW` (the reference's default).
  * MEASURES come from the per-step row bindings handed to the caller's
  * `emit` (FIRST/LAST/count of any step are projections of those
  * bindings). Not covered (documented non-goals): cross-row DEFINE
  * references (PREV/NEXT), reluctant quantifiers, WITHIN.
  *
  * Execution: one code path for both modes via `flatMapGroupsWithState`.
  * Streaming: rows buffer per key; on every trigger (or event-time
  * timeout) the watermark-closed, (ts, event_id)-sorted prefix runs
  * through the NFA; complete matches emit, consumed rows drop, and a
  * partial match still viable at the prefix end retains its rows — so
  * out-of-order arrival within the watermark delay cannot corrupt a
  * match. Batch: a single pass over each key's full sorted sequence
  * (watermark = ∞), which is what the q89 DuckDB oracle hash-checks.
  *
  * State is O(pending rows of an open partial match) per key, matching
  * the reference NFA's per-key buffer; as there, a partial match with no
  * continuation lingers until one arrives (no WITHIN pruning).
  */
object PatternMatch {

  sealed trait Quant extends Serializable
  case object One extends Quant
  case object Opt extends Quant
  case object Plus extends Quant
  case object Star extends Quant

  /** One PATTERN step: a named predicate with a quantifier. */
  final case class Step(name: String, pred: Event => Boolean, quant: Quant)

  /** Rows bound to one step in one match (empty for unused Opt/Star). */
  final case class Bound(name: String, rows: Seq[Event])

  case class BufState(rows: Seq[Event])

  /** Result of attempting a match at a fixed start offset. */
  private sealed trait Attempt
  private final case class Matched(endExclusive: Int, binds: List[(Int, Int)]) extends Attempt
  private case object NoMatch extends Attempt
  private case object NeedMore extends Attempt // pattern ran off the buffer

  /** Greedy backtracking matcher. When a greedy arm runs off the buffer
    * end and the input is NOT final (streaming: rows with later event
    * times may still arrive), NeedMore dominates — the match cannot be
    * adjudicated yet and its rows must be held rather than committing to
    * a shorter alternative that more input might invalidate. With
    * `finalInput` (batch, or a stream's closing pass) the buffer end is
    * the end of the sequence and backtracking proceeds normally. */
  private def tryMatch(steps: IndexedSeq[Step], rows: IndexedSeq[Event],
      start: Int, finalInput: Boolean): Attempt = {
    def go(si: Int, ri: Int): Attempt =
      if (si == steps.length) Matched(ri, Nil)
      else {
        val st = steps(si)
        st.quant match {
          case One =>
            if (ri >= rows.length) { if (finalInput) NoMatch else NeedMore }
            else if (!st.pred(rows(ri))) NoMatch
            else go(si + 1, ri + 1) match {
              case Matched(e, b) => Matched(e, (si, ri) :: b)
              case other => other
            }
          case Opt =>
            if (ri >= rows.length) {
              if (finalInput) go(si + 1, ri) // skip: empty binding
              else NeedMore // greedy arm undecidable
            } else if (st.pred(rows(ri)))
              go(si + 1, ri + 1) match {
                case Matched(e, b) => Matched(e, (si, ri) :: b)
                case NeedMore => NeedMore
                case NoMatch => go(si + 1, ri) // backtrack: skip the row
              }
            else go(si + 1, ri)
          case Plus | Star =>
            var j = ri
            while (j < rows.length && st.pred(rows(j))) j += 1
            if (j == rows.length && !finalInput) NeedMore // run touches buffer end
            else {
              val minEnd = if (st.quant == Plus) ri + 1 else ri
              var k = j // greedy: longest run first
              while (k >= minEnd) {
                go(si + 1, k) match {
                  case Matched(e, b) =>
                    return Matched(e, (ri until k).map((si, _)).toList ::: b)
                  case NeedMore => return NeedMore
                  case NoMatch => k -= 1
                }
              }
              NoMatch
            }
        }
      }
    go(0, start)
  }

  /** Scan a sorted closed prefix: emit matches (skip past last row),
    * return the bound-rows of each match and the index the buffer must be
    * retained from (first row of an unadjudicated partial match). */
  private def scan(steps: IndexedSeq[Step], rows: IndexedSeq[Event],
      finalInput: Boolean): (List[List[Bound]], Int) = {
    val out = List.newBuilder[List[Bound]]
    var i = 0
    var retain = rows.length
    var open = true
    while (i < rows.length && open) {
      tryMatch(steps, rows, i, finalInput) match {
        case Matched(end, binds) =>
          val byStep = binds.groupBy(_._1)
          out += steps.indices.map(si =>
            Bound(steps(si).name, byStep.getOrElse(si, Nil).map(p => rows(p._2)))).toList
          i = math.max(end, i + 1) // guard: an all-optional empty match
        case NoMatch => i += 1
        case NeedMore => retain = i; open = false
      }
    }
    (out.result(), if (open) rows.length else retain)
  }

  /** Run `steps` over each key's event-time-ordered sequence; one output
    * row per match via `emit(key, boundSteps)`. Works on streaming and
    * batch Datasets (see object doc). */
  def matchPattern[O: Encoder](events: Dataset[Event], steps: Seq[Step],
      delay: String, emit: (Long, Seq[Bound]) => O): Dataset[O] = {
    require(steps.nonEmpty, "PATTERN must have at least one step")
    val stepsArr = steps.toIndexedSeq
    val isBatch = !events.isStreaming
    // A STREAMING pattern ending in a greedy quantifier can never be
    // adjudicated: a trailing B+/B*/B? run is always extendable by rows
    // with later event times, so every candidate would sit in NeedMore
    // forever (matching Flink CEP, which needs WITHIN to bound such
    // patterns). Fail fast instead of silently emitting nothing.
    require(isBatch || steps.last.quant == One,
      "a streaming PATTERN must end with an exactly-one step: a trailing " +
        s"'${steps.last.name}' with quantifier ${steps.last.quant} can " +
        "always be extended by future rows and would never finalize")
    implicit val stateEnc: Encoder[BufState] = Encoders.product[BufState]
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[Event], state: GroupState[BufState]) => {
          import StatefulOps.eventMicros
          val buf = state.getOption.map(_.rows).getOrElse(Nil) ++ rows
          // full-precision (micros) ordering and watermark comparison —
          // getTime truncates to ms and would mis-order same-ms events
          val wmUs =
            if (isBatch) Long.MaxValue
            else state.getCurrentWatermarkMs() * 1000L
          val sorted = buf.sortBy(e => (eventMicros(e.ts), e.event_id)).toIndexedSeq
          val closedN = sorted.segmentLength(e => eventMicros(e.ts) <= wmUs)
          val (matches, retainFrom) = scan(stepsArr, sorted.take(closedN), isBatch)
          val kept = sorted.slice(retainFrom, closedN) ++ sorted.drop(closedN)
          if (kept.isEmpty) state.remove()
          else {
            state.update(BufState(kept))
            if (!isBatch) {
              // ts-1 (ms) fires once the watermark REACHES the earliest
              // retained row (Spark fires strictly-after the registered
              // timestamp); clamp above the current watermark
              val headMs = eventMicros(kept.head.ts) / 1000
              state.setTimeoutTimestamp(
                math.max(headMs - 1, state.getCurrentWatermarkMs() + 1))
            }
          }
          matches.iterator.map(emit(key, _))
        })
  }
}
