package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Event

/** Dev utility: streaming soak at scale (round-9 VERDICT #6). The
  * stateful operator suite is spec-proven on RocksDB at toy volume; this
  * tool drives the five state-bearing operators (q72 top-n, q73
  * keep-last, q94 ROWS frame, q95 RANGE frame, q124 reservoir) through a
  * REAL multi-batch file stream over ~10M tiled events on the RocksDB
  * state store, records per-batch state/latency metrics from
  * StreamingQueryProgress, and checks zero semantic drift against the
  * same operator run in one batch over the identical frame.
  *
  * Mechanics:
  *  - events are tiled `factor`× from the base fixture with per-replica
  *    key offsets (same discipline as [[ScaleGen]]), RANGE-partitioned
  *    by ts into `nFiles` files so file order is time order — the file
  *    stream (maxFilesPerTrigger=1) then replays history in watermark-
  *    compatible order, one micro-batch per file;
  *  - a sentinel event (event_id = -1) 10 years past the data's end is
  *    written as a final extra file: its arrival pushes the event-time
  *    watermark past every real row, so the frame operators adjudicate
  *    their tails before AvailableNow terminates (excluded from all
  *    comparisons);
  *  - drift checks reconstruct each operator's FINAL answer from the
  *    emitted append log with the operator's own monotonicity (top-n
  *    entries only ever came through the log; keep-last's final winner
  *    is the log's (ts, event_id)-max per key; the reservoir is
  *    bottom-k-by-hash of logged ids) and compare with the batch run's
  *    final answer reconstructed the same way; the ROWS/RANGE frame
  *    operators emit exactly one row per input row, so there the whole
  *    multiset must match.
  *
  * Usage: runMain graft.tools.StreamSoak <baseSfDir> <workDir> [factor]
  * [nFiles] — emits one JSON line per (operator, batch) plus a summary
  * line per operator to <workDir>/soak.jsonl.
  */
object StreamSoak {

  def main(args: Array[String]): Unit = {
    val base = args(0)
    val work = args(1)
    val factor = if (args.length > 2) args(2).toInt else 100
    val nFiles = if (args.length > 3) args(3).toInt else 20
    val spark = graft.core.SessionFactory.local("graft-stream-soak")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    val eventsDir = s"$work/events_tiled"
    tileEvents(spark, base, eventsDir, factor, nFiles)
    val out = new PrintWriter(s"$work/soak.jsonl")

    val batchDs = spark.read.parquet(eventsDir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
      .as[Event]
    def streamDs = spark.readStream
      .schema(batchDs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(eventsDir)
      .as[Event]

    // (name, stream-op, batch-op, final-reconstruction, exact-multiset?)
    type Op = Dataset[Event] => DataFrame
    val real = (df: DataFrame) => df.filter(col("event_id") >= 0L)

    def finalTopN(log: DataFrame): DataFrame = {
      // top-n entries only ever enter through the log; final = top-n of
      // everything logged, ranked the operator's way (value desc, id asc)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id").asc)
      real(log).select("user_id", "event_id", "value").distinct()
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
    }
    def finalKeepLast(log: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      real(log).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    def finalReservoir(log: DataFrame): DataFrame = {
      // final membership = bottom-k by the operator's own deterministic
      // pseudo-rank over every id that ever entered (the log re-emits the
      // full sample on change, so it contains every final member; evicted
      // ids rank below by construction)
      import org.apache.spark.sql.expressions.Window
      val rankOf = udf((id: Long) =>
        graft.operators.Sampling.pseudoRankLong(id, 7L))
      val w = Window.partitionBy("stratum")
        .orderBy(col("prank"), col("item_id"))
      log.select("stratum", "item_id").distinct()
        .withColumn("prank", rankOf(col("item_id")))
        .withColumn("sample_rank", row_number().over(w))
        .filter(col("sample_rank") <= 32)
        .select("stratum", "item_id", "sample_rank")
    }

    val ops: Seq[(String, Op, DataFrame => DataFrame, Boolean)] = Seq(
      ("topn",
        (ds: Dataset[Event]) => StatefulOps.topNPerKey(ds, 3).toDF(),
        finalTopN _, false),
      ("keeplast",
        (ds: Dataset[Event]) => StatefulOps.keepLastDedup(ds).toDF(),
        finalKeepLast _, false),
      ("rows_frame",
        (ds: Dataset[Event]) =>
          StatefulOps.rowsBoundedAggregates(ds, 4, "60 seconds").toDF(),
        (log: DataFrame) => real(log), true),
      ("range_frame",
        (ds: Dataset[Event]) =>
          StatefulOps.rangeBoundedAggregates(ds,
            java.time.Duration.ofHours(1), "60 seconds").toDF(),
        (log: DataFrame) => real(log), true),
      ("reservoir",
        (ds: Dataset[Event]) => StatefulOps.reservoirPerKey(
          ds.map(e => (e.event_type, e.event_id)), 32, seed = 7L).toDF(),
        finalReservoir _, false))

    ops.foreach { case (name, op, finalize, exactMultiset) =>
      val sinkDir = s"$work/out_$name"
      val ckpt = s"$work/ckpt_$name"
      val t0 = System.nanoTime()
      val q = op(streamDs).writeStream
        .format("parquet").option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      // per-batch state metrics (recentProgress keeps the last ~100)
      q.recentProgress.foreach { p =>
        val so = p.stateOperators.headOption
        val rocks = so.map(_.customMetrics).map { m =>
          Seq("rocksdbSstFileSize", "rocksdbTotalCompactTime",
            "rocksdbTotalBytesWrittenByCompaction").flatMap { k =>
            Option(m.get(k)).map(v => s""""$k":$v""")
          }.mkString(",")
        }.getOrElse("")
        out.println(s"""{"op":"$name","batch":${p.batchId},""" +
          s""""input_rows":${p.numInputRows},""" +
          s""""batch_ms":${Option(p.durationMs.get("triggerExecution")).getOrElse(-1L)},""" +
          s""""state_rows":${so.map(_.numRowsTotal).getOrElse(-1L)},""" +
          s""""state_mem":${so.map(_.memoryUsedBytes).getOrElse(-1L)}""" +
          (if (rocks.nonEmpty) s",$rocks" else "") + "}")
      }
      // drift check vs the batch collapse
      val streamFinal = finalize(spark.read.parquet(sinkDir))
      val batchFinal = finalize(op(batchDs))
      val onlyS = streamFinal.exceptAll(batchFinal).count()
      val onlyB = batchFinal.exceptAll(streamFinal).count()
      val rows = streamFinal.count()
      out.println(s"""{"op":"$name","summary":true,"wall_sec":$wall,""" +
        s""""final_rows":$rows,"only_stream":$onlyS,"only_batch":$onlyB,""" +
        s""""drift":${if (onlyS + onlyB > 0) "true" else "false"},""" +
        s""""exact_multiset":$exactMultiset}""")
      out.flush()
      System.err.println(s"[stream-soak] $name done: wall=$wall drift=${onlyS + onlyB}")
    }
    out.close()
    spark.stop()
  }

  /** Tile the base events `factor`× (ScaleGen key-offset discipline),
    * range-partition by ts so file order is time order, and append the
    * watermark sentinel as a final file. */
  private def tileEvents(spark: SparkSession, base: String, outDir: String,
      factor: Int, nFiles: Int): Unit = {
    import spark.implicits._
    val src = graft.core.Catalog.load(spark, base, "events")
    val strideE = src.agg(max(col("event_id"))).head.getLong(0) + 1
    val strideU = src.agg(max(col("user_id"))).head.getLong(0) + 1
    val maxTs = src.agg(max(col("ts"))).head.getTimestamp(0)
    val tiled = src
      .withColumn("replica", explode(array((0 until factor).map(lit): _*)))
      .withColumn("event_id", col("event_id") + col("replica") * strideE)
      .withColumn("user_id", col("user_id") + col("replica") * strideU)
      .drop("replica")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
    tiled.repartitionByRange(nFiles, col("ts"), col("event_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(outDir)
    // TWO sentinel files (final two micro-batches): the watermark
    // computed from sentinel 1's far-future ts is only APPLIED at the
    // start of the next batch, so sentinel 2's batch is where every
    // key's event-time timeout fires and the frame operators adjudicate
    // their tails — with a single sentinel, AvailableNow terminates
    // before the last watermark ever takes effect
    val s1 = new java.sql.Timestamp(maxTs.getTime + 10L * 365 * 24 * 3600 * 1000)
    val s2 = new java.sql.Timestamp(s1.getTime + 24 * 3600 * 1000)
    Seq((-1L, s1), (-2L, s2)).foreach { case (id, ts) =>
      val tmp = s"$outDir-sentinel$id"
      Seq((0L, id, ts, "sentinel", 0.0))
        .toDF("user_id", "event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$outDir/zz-sentinel${-id}.parquet").toPath)
    }
    // The file stream replays files in MODIFICATION-TIME order, and
    // parallel write tasks finish in arbitrary order — so a range
    // partitioner's time ordering is NOT the stream's replay ordering
    // (first soak run: half the fleet's rows replayed "out of the
    // future" and were dropped as late). Pin mtimes to path order:
    // part-0000N gets base + N seconds, the zz-sentinels last.
    val parts = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val base0 = (System.currentTimeMillis() / 1000) * 1000 - 3600 * 1000L
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(base0 + i * 1000L)
    }
  }
}
