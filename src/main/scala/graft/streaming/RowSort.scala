package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming EVENT-TIME SORT over an ARBITRARY DataFrame — the
  * general-schema twin of [[StatefulOps.sortByEventTime]], the last
  * stateful operator that was Event-typed (reference:
  * flink-table-runtime-blink .../operators/sort/RowTimeSortOperator.java
  * via StreamExecSort / StreamExecTemporalSort — buffer out-of-order
  * rows and release them in order once the watermark passes their
  * timestamp, i.e. re-establish event-time order up to the declared
  * out-of-order bound).
  *
  * `orderCols` is (leading event-time timestamp, tie-break columns...),
  * all ascending — the reference's streaming sort key shape (rowtime
  * first, StreamExecSortRule requires it). Total order is inherently
  * single-stream, exactly as the reference runs streaming sort at
  * parallelism 1: the operator is for ORDERED TAPS (alert streams,
  * audit logs), not bulk data paths — on a bulk path sort the batch
  * collapse (a plain ORDER BY) instead. An event-time timer drains the
  * buffer when the watermark advances without new rows; state is the
  * not-yet-released buffer, bounded by the watermark delay. In batch
  * execution the whole input is final and the operator collapses to the
  * plain ORDER BY — the oracle shape.
  */
object RowSort {

  /** Buffered not-yet-releasable rows (java-serialized, like the other
    * general-schema executors). */
  final case class SortState(rows: Seq[Seq[Any]])

  def sortByEventTime(df: DataFrame, orderCols: Seq[String],
      delay: String = "0 seconds"): DataFrame = {
    require(orderCols.nonEmpty, "ORDER BY must name at least one column")
    val schema = df.schema
    orderCols.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"column '$c' not in input schema ${schema.fieldNames.mkString(", ")}")
      OverAggregates.requireOrderable(schema, c)
    }
    val leadIdx = schema.fieldIndex(orderCols.head)
    val isStreaming = df.isStreaming
    if (isStreaming) require(schema.fields(leadIdx).dataType == TimestampType,
      "streaming sort orders on event time: the leading ORDER BY column " +
        s"must be a timestamp, got ${schema.fields(leadIdx).dataType}")
    val ord = OverAggregates.seqOrdering(orderCols.map(schema.fieldIndex))
    def leadUs(vals: Seq[Any]): Long =
      StatefulOps.eventMicros(vals(leadIdx).asInstanceOf[java.sql.Timestamp])
    val outEnc: Encoder[Row] = Encoders.row(schema)
    implicit val stEnc: Encoder[SortState] = Encoders.javaSerialization[SortState]

    df.withWatermark(orderCols.head, delay)
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (_: Int, rows: Iterator[Row], state: GroupState[SortState]) => {
          val buf = (state.getOption.map(_.rows).getOrElse(Nil) ++
            rows.map(_.toSeq)).sorted(ord)
          // batch: no watermark exists — the whole input is final (and
          // the leading column need not be a timestamp there)
          val (ripe, pending) =
            if (!isStreaming) (buf, Nil)
            else {
              val wmUs = state.getCurrentWatermarkMs() * 1000L
              buf.partition(v => leadUs(v) <= wmUs)
            }
          if (pending.isEmpty) state.remove()
          else {
            state.update(SortState(pending))
            // fire as soon as the watermark can cover the earliest
            // pending row; never at/below the current watermark
            val headMs = leadUs(pending.head) / 1000
            state.setTimeoutTimestamp(
              math.max(headMs - 1, state.getCurrentWatermarkMs() + 1))
          }
          ripe.iterator.map(Row.fromSeq)
        })(stEnc, outEnc)
  }
}
