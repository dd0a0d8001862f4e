package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

/** Stream-stream semi/anti joins (reference:
  * StreamingSemiAntiJoinOperator.java:35).
  *
  * Semi: Spark's stream-stream `left_semi` join is used directly (each
  * left row emits at most once, when a time-bounded match exists).
  *
  * Anti: Spark rejects `left_anti` with a streaming right side
  * (UnsupportedOperationChecker), but the operator's semantics — emit a
  * left row only when the advancing watermark PROVES no right match can
  * still arrive — are exactly those of the supported watermark-closed
  * left-OUTER join followed by an is-null filter on the right side. The
  * composition below is therefore semantically identical to the
  * reference operator, including emission timing: outer-join nulls (and
  * hence anti rows) materialize only once the watermark passes the join
  * bound. Both inputs must carry watermarks and the condition must
  * time-bound the match window, as with any stream-stream outer join.
  */
object StreamJoins {

  /** Stream-stream anti join: left rows with no match under `cond`,
    * emitted when the watermark closes the match window. `rightProbe`
    * must be a non-nullable-by-construction right-side column (e.g. its
    * key); it is null exactly on the unmatched rows. Output keeps only
    * the left side's columns. */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column,
      rightProbe: Column): DataFrame = {
    val leftCols = left.columns.map(left(_))
    left.join(right, cond, "left_outer")
      .filter(rightProbe.isNull)
      .select(leftCols: _*)
  }

  /** Stream-stream semi join: left rows with ≥1 match under `cond`, each
    * emitted once. Thin alias over the native operator, here so the
    * semi/anti pair ships as one surface. */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")
}
