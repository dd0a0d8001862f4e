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
  * the upsert keys — the natural shuffle key. With `nBuckets = 1` the
  * whole state table is rewritten per batch under a snapshot swap; with
  * `nBuckets > 1` the state is hash-partitioned on the keys and each
  * batch rewrites ONLY the buckets it touches (dynamic partition
  * overwrite — the standard merge-on-read refinement), so per-batch write
  * volume is proportional to touched buckets, not total state. The
  * bucketed path trades the all-or-nothing snapshot for per-bucket
  * atomicity; that is safe under the streaming engine's semantics because
  * the merge is IDEMPOTENT — re-applying the same batch after a failure
  * reproduces the same state.
  */
object UpsertSink {

  /** Merge one batch into the keyed state table under `dir`. Exposed for
    * batch callers too: folding a bounded frame through it equals
    * keep-last dedup. */
  def mergeBatch(batch: DataFrame, keys: Seq[String], orderCols: Seq[String],
      dir: String, nBuckets: Int = 1): Unit = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols required")
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val spark = batch.sparkSession
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = new Path(dir, "current")
    if (nBuckets == 1) {
      val merged =
        if (fs.exists(current))
          spark.read.parquet(current.toString)
            .join(latest.select(keys.map(col): _*), keys, "left_anti")
            .unionByName(latest)
        else latest
      writeSnapshot(merged, dir)
    } else {
      val bucketed = latest.withColumn("__bucket",
        pmod(hash(keys.map(col): _*), lit(nBuckets)))
      if (!fs.exists(current)) {
        bucketed.write.partitionBy("__bucket").parquet(current.toString)
      } else {
        // ≤ nBuckets small integers reach the driver — bounded by
        // construction, independent of state or batch size
        val touched = bucketed.select(col("__bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq
        // materialize the touched buckets BEFORE the overwrite job so the
        // write never races its own input; the working set is the touched
        // buckets only (partition-pruned scan), which is what bucketing
        // bounds
        val old = spark.read.parquet(current.toString)
          .filter(col("__bucket").isin(touched: _*))
          .localCheckpoint(true)
        val merged = old
          .join(bucketed.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(bucketed)
        merged.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__bucket").parquet(current.toString)
      }
    }
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
      orderCols: Seq[String], dir: String, nBuckets: Int = 1): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch((batch: DataFrame, _: Long) =>
        mergeBatch(batch, keys, orderCols, dir, nBuckets))

  /** Read the sink's current state (empty-schema-safe only once a batch
    * has committed). */
  def currentState(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(new Path(dir, "current").toString)
    if (df.columns.contains("__bucket")) df.drop("__bucket") else df
  }
}
