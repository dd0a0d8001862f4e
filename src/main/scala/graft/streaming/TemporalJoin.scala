package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming temporal (event-time as-of) join — the SURVEY §7.3 committed
  * custom operator (reference: TemporalRowTimeJoinOperator.java:71, ~400
  * LoC of keyed state): enrich each fact of a stream with the latest
  * version of a dimension row whose event time is ≤ the fact's event time,
  * emitting a fact only once the watermark has passed its timestamp — so
  * out-of-order and late-arriving *versions* (the hard case) are still
  * considered as long as they beat the watermark.
  *
  * Spark-native shape: both inputs are tagged into one envelope, unioned,
  * watermarked, keyed by the join key, and processed with
  * `flatMapGroupsWithState` + `EventTimeTimeout`:
  *
  *  - state = pending facts (not yet past-watermark) + buffered dimension
  *    versions, exactly the reference's two keyed state handles
  *    (`leftState` / `rightState`);
  *  - on every invocation (new rows OR event-time timeout) all facts with
  *    `ts ≤ watermark` are joined against the latest version ≤ their ts
  *    and emitted, in ts order;
  *  - version state is pruned to the newest version ≤ watermark plus all
  *    newer ones (the reference's `cleanUp` on watermark advance): any
  *    older version can never match a remaining fact, and the per-key
  *    state stays O(pending + recent versions), not O(history);
  *  - an event-time timeout is registered at the earliest pending fact's
  *    timestamp, so watermark advance alone (without new per-key rows)
  *    still flushes eligible facts.
  *
  * Facts with no preceding version emit with None (left-outer semantics,
  * matching the batch [[graft.operators.AsOfJoin]] rewrite whose q63
  * oracle doubles as this operator's collapse-to-batch gate — in batch
  * execution there is no watermark, so everything flushes in one pass).
  */
object TemporalJoin {

  /** Fact-stream row (left side). */
  case class Fact(k: Long, ts: Timestamp, fact_id: Long, fact_value: Double)

  /** Dimension-version row (right side); higher `ver` wins ties on ts. */
  case class DimVersion(k: Long, ts: Timestamp, ver: Long, dim_value: Double)

  /** Enriched output; dim fields are None when no version precedes. */
  case class Enriched(k: Long, ts: Timestamp, fact_id: Long,
      fact_value: Double, dim_ver: Option[Long], dim_value: Option[Double])

  /** Internal union envelope (side 0 = dim, 1 = fact — dims sort first). */
  case class Tagged(k: Long, ts: Timestamp, side: Int,
      fact_id: Long, fact_value: Double, ver: Long, dim_value: Double)

  // tsUs = full-precision event time in epoch MICROS (StatefulOps.
  // eventMicros): Timestamp.getTime truncates to ms, and a version up to
  // 999us after a fact must NOT be treated as at-or-before it
  case class FactRec(tsUs: Long, ts: Timestamp, factId: Long, factValue: Double)
  case class DimRec(tsUs: Long, ver: Long, dimValue: Double)
  case class JoinState(facts: Seq[FactRec], dims: Seq[DimRec])

  private def tagFact(f: Fact): Tagged =
    Tagged(f.k, f.ts, 1, f.fact_id, f.fact_value, 0L, 0.0)
  private def tagDim(d: DimVersion): Tagged =
    Tagged(d.k, d.ts, 0, 0L, 0.0, d.ver, d.dim_value)

  /** Processing-time temporal join (reference
    * TemporalProcessTimeJoinOperator.java:126): each fact enriches with
    * the latest dimension version SEEN so far — no watermark, no
    * buffering, facts emit immediately. Within one micro-batch the
    * dimension rows apply before the fact rows (the version a fact "sees"
    * is deterministic: everything up to and including its own trigger).
    * Per-key state is exactly one row — the current version. */
  def temporalJoinProcTime(facts: Dataset[Fact],
      dims: Dataset[DimVersion]): Dataset[Enriched] = {
    val spark = facts.sparkSession
    import spark.implicits._
    val taggedFacts = facts.map(tagFact _)
    val taggedDims = dims.map(tagDim _)
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stateEnc = Encoders.product[DimRec]
    taggedFacts.unionByName(taggedDims)
      .groupByKey(_.k)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[Tagged], state: GroupState[DimRec]) => {
          import StatefulOps.eventMicros
          val (dimRows, factRows) = rows.toSeq.partition(_.side == 0)
          // newest version wins: later (event ts, ver) replaces current
          dimRows.sortBy(r => (eventMicros(r.ts), r.ver)).foreach { d =>
            val dUs = eventMicros(d.ts)
            val newer = state.getOption.forall(c =>
              dUs > c.tsUs || (dUs == c.tsUs && d.ver >= c.ver))
            if (newer) state.update(DimRec(dUs, d.ver, d.dim_value))
          }
          val m = state.getOption
          factRows.sortBy(f => (eventMicros(f.ts), f.fact_id)).iterator.map { f =>
            Enriched(key, f.ts, f.fact_id, f.fact_value,
              m.map(_.ver), m.map(_.dimValue))
          }
        })
  }

  /** Event-time as-of join of a fact stream against a versioned dimension
    * stream on key `k`. `delay` is the shared watermark delay (bounds how
    * late a fact or version may arrive and still be honored). Works on
    * batch Datasets too (single flush — used by the oracle-parity spec).
    *
    * `idleRetentionMs`: by default a key's newest version is retained
    * forever (any future fact may need it). For long-running streams over
    * churning key spaces, pass a retention to reclaim version state for
    * keys with no pending facts once the watermark has advanced that far
    * past their last activity (the reference's CleanupState idle
    * retention) — facts for an expired key enrich as if no version
    * preceded them. */
  def temporalJoin(facts: Dataset[Fact], dims: Dataset[DimVersion],
      delay: String, idleRetentionMs: Option[Long] = None): Dataset[Enriched] = {
    val spark = facts.sparkSession
    import spark.implicits._
    // in batch execution there is no watermark; flush everything
    val isBatch = !facts.isStreaming
    val taggedFacts = facts.map(tagFact _)
    val taggedDims = dims.map(tagDim _)
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stateEnc = Encoders.product[JoinState]
    taggedFacts.unionByName(taggedDims)
      .withWatermark("ts", delay)
      .groupByKey(_.k)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[Tagged], state: GroupState[JoinState]) => {
          import StatefulOps.eventMicros
          val prev = state.getOption.getOrElse(JoinState(Nil, Nil))
          val factB = Seq.newBuilder[FactRec]
          val dimB = Seq.newBuilder[DimRec]
          factB ++= prev.facts
          dimB ++= prev.dims
          rows.foreach { r =>
            if (r.side == 1)
              factB += FactRec(eventMicros(r.ts), r.ts, r.fact_id, r.fact_value)
            else dimB += DimRec(eventMicros(r.ts), r.ver, r.dim_value)
          }
          val wmUs =
            if (isBatch) Long.MaxValue
            else state.getCurrentWatermarkMs() * 1000L
          val (ripe, pending) = factB.result().partition(_.tsUs <= wmUs)
          // latest version at-or-before each ripe fact (ties: highest
          // ver): one merge pass over the two sorted sequences —
          // O(F + D), not a takeWhile rescan per fact
          val sortedDims = dimB.result().sortBy(d => (d.tsUs, d.ver)).toIndexedSeq
          var di = 0
          val out = ripe.sortBy(f => (f.tsUs, f.factId)).map { f =>
            while (di < sortedDims.length && sortedDims(di).tsUs <= f.tsUs) di += 1
            val m = if (di == 0) None else Some(sortedDims(di - 1))
            Enriched(key, f.ts, f.factId, f.factValue,
              m.map(_.ver), m.map(_.dimValue))
          }
          // prune: newest version ≤ wm still matters for future facts
          // (their ts > wm); everything older than it never matches again
          val cutIdx = sortedDims.lastIndexWhere(_.tsUs <= wmUs)
          val keptDims = if (cutIdx <= 0) sortedDims else sortedDims.drop(cutIdx)
          if (pending.isEmpty && keptDims.isEmpty) state.remove()
          else if (state.hasTimedOut && pending.isEmpty && ripe.isEmpty &&
              idleRetentionMs.isDefined) {
            // idle expiry: the key woke on its retention timer with no
            // pending facts and nothing new — drop the version state
            // (reference CleanupState idle retention). A fact arriving
            // later re-enriches from versions still in flight only.
            state.remove()
          } else {
            state.update(JoinState(pending, keptDims))
            // wake this key once the watermark can cover its earliest
            // pending fact even if no further rows arrive: registering
            // ts-1 (ms) fires when wm >= ts (Spark fires strictly after
            // the registered timestamp); clamp above the current wm
            if (!isBatch && pending.nonEmpty) {
              val headMs = pending.map(_.tsUs).min / 1000
              state.setTimeoutTimestamp(
                math.max(headMs - 1, state.getCurrentWatermarkMs() + 1))
            } else if (!isBatch && idleRetentionMs.isDefined) {
              // no pending facts: arm the idle-retention timer so version
              // state for keys that go quiet is eventually reclaimed
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + idleRetentionMs.get)
            }
          }
          out.iterator
        })
  }
}
