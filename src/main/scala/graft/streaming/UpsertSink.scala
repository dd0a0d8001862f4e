package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Keyed upsert sink — the reference's `UpsertStreamTableSink` contract
  * (reference: flink-table-api-java-bridge .../sinks/UpsertStreamTableSink.java:
  * setKeyFields + upsert/delete record stream), re-expressed as a
  * Structured Streaming `foreachBatch` merge: the sink directory's
  * `current` table always holds the latest row per key.
  *
  * Per micro-batch: collapse the batch to its latest row per key (by
  * `orderCols`, descending), anti-join the previous state on the keys,
  * union, write a fresh snapshot, swap directories. The swap is
  * rename-based — atomic for readers on a POSIX/HDFS filesystem under the
  * streaming engine's single-writer guarantee; production deployments on
  * object stores should back the same merge with a transactional table
  * format, exactly as the reference delegates storage atomicity to the
  * sink's backing system.
  *
  * Scale notes: the merge is one window (keep-last within the batch —
  * batch-sized, small) plus one anti-join against the state table keyed on
  * the upsert keys — the natural shuffle key. State is rewritten per
  * batch; at 100 TB state with small batches, partition the state table by
  * a key hash bucket and rewrite only the buckets the batch touches (the
  * standard merge-on-read refinement; the semantics here are the
  * contract).
  */
object UpsertSink {

  /** Merge one batch into the keyed state table under `dir`. Exposed for
    * batch callers too: folding a bounded frame through it equals
    * keep-last dedup. */
  def mergeBatch(batch: DataFrame, keys: Seq[String], orderCols: Seq[String],
      dir: String): Unit = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols required")
    val spark = batch.sparkSession
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = new Path(dir, "current")
    val merged =
      if (fs.exists(current))
        spark.read.parquet(current.toString)
          .join(latest.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(latest)
      else latest
    writeSnapshot(merged, dir)
  }

  /** Write a fresh `current` snapshot under `dir` via staging + rename —
    * atomic for readers on rename-capable filesystems under the
    * streaming engine's single-writer guarantee. Shared by the upsert
    * and retract sinks. */
  private[streaming] def writeSnapshot(merged: DataFrame, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(
      merged.sparkSession.sparkContext.hadoopConfiguration)
    val current = new Path(dir, "current")
    val staging = new Path(dir, "staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    val retiring = new Path(dir, "retiring")
    if (fs.exists(retiring)) fs.delete(retiring, true)
    if (fs.exists(current)) fs.rename(current, retiring)
    fs.rename(staging, current)
    fs.delete(retiring, true)
  }

  /** Streaming writer maintaining `dir/current` as latest-row-per-key. */
  def upsertWriter(stream: DataFrame, keys: Seq[String],
      orderCols: Seq[String], dir: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch((batch: DataFrame, _: Long) =>
        mergeBatch(batch, keys, orderCols, dir))

  /** Read the sink's current state (empty-schema-safe only once a batch
    * has committed). */
  def currentState(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(new Path(dir, "current").toString)
}
