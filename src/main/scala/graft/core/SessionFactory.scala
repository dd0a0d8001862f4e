package graft.core

import org.apache.spark.sql.SparkSession

/** Single place all entry points (Verify, Bench, tests) build their
  * SparkSession, so correctness runs, benchmarks and specs agree on the
  * semantics-bearing config.
  *
  * The knobs mirror the reference harness's tuned settings
  * (reference: flink-dist conf/flink-conf-online.yaml:26-73 — parallelism 32,
  * blocking shuffle; TpcDsBatchExecITCase.scala:71-78 — join reorder +
  * subplan reuse on), re-expressed as their Spark equivalents. AQE stays on:
  * at 100 TB it is what converts static shuffle-partition guesses into
  * runtime-sized partitions, demotes shuffles to broadcasts when the built
  * side turns out small, and splits skewed join partitions.
  */
object SessionFactory {

  def defaultParallelism: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(appName: String, cpus: String = defaultParallelism): SparkSession = {
    val builder = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS) — no Spark type; read as long.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // decouple the shuffle-partition CEILING from the session default:
      // maps produce 128 partitions and AQE coalesces down to the advisory
      // size, so small inputs still run a handful of tasks while a large
      // shuffle keeps its reduce partitions sort-buffer-sized instead of
      // funneling into 32 oversized ones. The SF1 soak measured the value
      // on qds72's 344M-row inventory sort: ceiling 32 spilled 13 GB; 64/
      // 128/256 are all spill-free, and 128 was the fastest AND most
      // stable of the spill-free settings (51-63 s across fresh JVMs vs
      // 256's bimodal 65-183 s), while the sf0.1 full-set cost of any
      // ceiling is indistinguishable from 32 within session noise
      // (SCALE.md, scale/bench_ab.md). At cluster scale the same knob is
      // what lets one config serve sf0.001 specs and 100 TB runs.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "128"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // let AQE re-size partitions on plans that feed a persist(): the
      // iterative operators (connected components, Lloyd training) cache a
      // small label/centroid relation each round, and without this flag
      // every cached round materializes the static shuffle-partition count
      // regardless of how little data survived — at any scale, the round
      // frame should be sized by AQE's runtime stats, not the session
      // constant
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // CBO join reorder parity with the reference bench knobs. Measured
      // cost at fixture scale: ~0.2-0.7 s extra per multi-relation query
      // (stats estimation + DP reorder in the planner) — a constant that
      // matters at sf0.1 and vanishes against 100 TB execution, where the
      // stats-driven order is what prevents fact-times-fact accidents
      // (CboSpec proves the reorder fires and answers are unchanged).
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "32m")
    // dev-harness knob (audits/soaks only, never set by library users):
    // ';'-separated k=v pairs layered on top of the standard config —
    // e.g. the skewed-fixture soak scales the AQE skew thresholds down to
    // sandbox partition sizes the same way the ScaleSpec skew test does
    val withExtra = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(';').filter(_.contains('=')).foldLeft(builder) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k, v)
      }).getOrElse(builder)
    val spark = withExtra.getOrCreate()
    // opt-in rewrites (qds72 week-set filter; qds95 pair-exists → min/max):
    // always injected, each no-ops unless its spark.graft.* flag is set
    Seq(graft.plans.TransitiveSelfJoinFilter, graft.plans.PairExistsToMinMax)
      .foreach { rule =>
        if (!spark.experimental.extraOptimizations.contains(rule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
      }
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
