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

  case class FactRec(tsMs: Long, ts: Timestamp, factId: Long, factValue: Double)
  case class DimRec(tsMs: Long, ver: Long, dimValue: Double)
  case class JoinState(facts: Seq[FactRec], dims: Seq[DimRec])

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
    val taggedFacts = facts.map(f => Tagged(f.k, f.ts, 1, f.fact_id, f.fact_value, 0L, 0.0))
    val taggedDims = dims.map(d => Tagged(d.k, d.ts, 0, 0L, 0.0, d.ver, d.dim_value))
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stateEnc = Encoders.product[DimRec]
    taggedFacts.unionByName(taggedDims)
      .groupByKey(_.k)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[Tagged], state: GroupState[DimRec]) => {
          val (dimRows, factRows) = rows.toSeq.partition(_.side == 0)
          // newest version wins: later (event ts, ver) replaces current
          dimRows.sortBy(r => (r.ts.getTime, r.ver)).foreach { d =>
            val newer = state.getOption.forall(c =>
              d.ts.getTime > c.tsMs || (d.ts.getTime == c.tsMs && d.ver >= c.ver))
            if (newer) state.update(DimRec(d.ts.getTime, d.ver, d.dim_value))
          }
          val m = state.getOption
          factRows.sortBy(f => (f.ts.getTime, f.fact_id)).iterator.map { f =>
            Enriched(key, f.ts, f.fact_id, f.fact_value,
              m.map(_.ver), m.map(_.dimValue))
          }
        })
  }

  /** Event-time as-of join of a fact stream against a versioned dimension
    * stream on key `k`. `delay` is the shared watermark delay (bounds how
    * late a fact or version may arrive and still be honored). Works on
    * batch Datasets too (single flush — used by the oracle-parity spec).
    */
  def temporalJoin(facts: Dataset[Fact], dims: Dataset[DimVersion],
      delay: String): Dataset[Enriched] = {
    val spark = facts.sparkSession
    import spark.implicits._
    // in batch execution there is no watermark; flush everything
    val isBatch = !facts.isStreaming
    val taggedFacts = facts.map(f => Tagged(f.k, f.ts, 1, f.fact_id, f.fact_value, 0L, 0.0))
    val taggedDims = dims.map(d => Tagged(d.k, d.ts, 0, 0L, 0.0, d.ver, d.dim_value))
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stateEnc = Encoders.product[JoinState]
    taggedFacts.unionByName(taggedDims)
      .withWatermark("ts", delay)
      .groupByKey(_.k)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, rows: Iterator[Tagged], state: GroupState[JoinState]) => {
          val prev = state.getOption.getOrElse(JoinState(Nil, Nil))
          var factBuf = prev.facts
          var dimBuf = prev.dims
          rows.foreach { r =>
            if (r.side == 1)
              factBuf :+= FactRec(r.ts.getTime, r.ts, r.fact_id, r.fact_value)
            else dimBuf :+= DimRec(r.ts.getTime, r.ver, r.dim_value)
          }
          val wm = if (isBatch) Long.MaxValue else state.getCurrentWatermarkMs()
          val (ripe, pending) = factBuf.partition(_.tsMs <= wm)
          // latest version at-or-before each ripe fact (ties: highest ver)
          val sortedDims = dimBuf.sortBy(d => (d.tsMs, d.ver))
          val out = ripe.sortBy(f => (f.tsMs, f.factId)).map { f =>
            val m = sortedDims.takeWhile(_.tsMs <= f.tsMs).lastOption
            Enriched(key, f.ts, f.factId, f.factValue,
              m.map(_.ver), m.map(_.dimValue))
          }
          // prune: newest version ≤ wm still matters for future facts
          // (their ts > wm); everything older than it never matches again
          val cut = sortedDims.takeWhile(_.tsMs <= wm).lastOption
          val keptDims = cut match {
            case Some(c) => sortedDims.dropWhile(d => !(d.tsMs == c.tsMs && d.ver == c.ver))
            case None => sortedDims
          }
          if (pending.isEmpty && keptDims.isEmpty) state.remove()
          else {
            state.update(JoinState(pending, keptDims))
            // wake this key when the watermark reaches its earliest
            // pending fact, even if no further rows arrive for it
            if (!isBatch && pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_.tsMs).min)
          }
          out.iterator
        })
  }
}
