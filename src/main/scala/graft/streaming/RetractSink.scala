package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Accumulate/retract changelog sink — the reference's
  * `RetractStreamTableSink` contract (reference: flink-table-api-java-bridge
  * .../sinks/RetractStreamTableSink.java: a stream of (accumulate|retract
  * flag, row); the flag is the `BaseRow` 1-byte header, SURVEY §1.2):
  * applies a ±1-flagged changelog to a keyed running aggregate table, so
  * `dir/current` always holds (keys, cnt, total) for every LIVE key.
  *
  * Per micro-batch the changelog collapses to one partial aggregate
  * (sum of flags, sum of flag·value — map-side combined, shuffled on the
  * group keys), which full-outer merges with the prior state by addition;
  * a key whose count returns to zero leaves the table — full retraction,
  * the semantic the reference encodes with retract messages and Spark's
  * output modes do not surface directly. Scale notes as [[UpsertSink]]:
  * delta is batch-sized, the merge joins on the natural key, snapshot
  * swap is rename-atomic under the single-writer guarantee.
  */
object RetractSink {

  /** Apply one changelog batch. `flagCol` holds +1 (accumulate) or -1
    * (retract); `valueCol` is the measure being aggregated.
    *
    * Unlike the upsert merge, the retraction algebra is additive — NOT
    * idempotent under replay — so the streaming writer passes the engine's
    * `batchId` and an already-applied id is skipped: Structured Streaming
    * re-runs a failed batch with identical content, and the recorded
    * high-water mark (written after the snapshot commits) turns that
    * replay into a no-op, giving effectively-once application. Batch
    * callers that pass no id (`batchId = -1`) are applied
    * unconditionally. */
  def mergeBatch(batch: DataFrame, keys: Seq[String], flagCol: String,
      valueCol: String, dir: String, batchId: Long = -1L): Unit = {
    require(keys.nonEmpty, "keys required")
    val spark = batch.sparkSession
    if (batchId >= 0 && batchId <= lastApplied(spark, dir)) return
    val delta = batch.groupBy(keys.map(col): _*)
      .agg(sum(col(flagCol)).cast(LongType).as("cnt"),
        sum(col(flagCol).cast(DoubleType) * col(valueCol)).as("total"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = new Path(dir, "current")
    val merged =
      if (fs.exists(current)) {
        val old = spark.read.parquet(current.toString)
        old.as("o").join(delta.as("d"), keys, "full_outer")
          .select(keys.map(col) ++ Seq(
            (coalesce(col("o.cnt"), lit(0L)) + coalesce(col("d.cnt"), lit(0L)))
              .as("cnt"),
            (coalesce(col("o.total"), lit(0d)) + coalesce(col("d.total"), lit(0d)))
              .as("total")): _*)
      } else delta
    UpsertSink.writeSnapshot(merged.filter(col("cnt") =!= 0L), dir)
    if (batchId >= 0) recordApplied(spark, dir, batchId)
  }

  private def markerPath(dir: String) = new Path(dir, "_applied_batch")

  private def lastApplied(spark: org.apache.spark.sql.SparkSession,
      dir: String): Long = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }
  }

  private def recordApplied(spark: org.apache.spark.sql.SparkSession,
      dir: String, batchId: Long): Unit = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(batchId.toString.getBytes) finally out.close()
  }

  /** Streaming writer applying the changelog to `dir/current`. */
  def retractWriter(stream: DataFrame, keys: Seq[String], flagCol: String,
      valueCol: String, dir: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch((batch: DataFrame, id: Long) =>
        mergeBatch(batch, keys, flagCol, valueCol, dir, id))
}
