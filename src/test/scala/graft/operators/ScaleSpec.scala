package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-mechanics specs (SURVEY.md §4.3): bucketed co-located joins that
  * plan without a shuffle, and salted joins that spread hot keys while
  * preserving results. These pin the techniques the engine relies on at
  * 100 TB, at spec scale. */
class ScaleSpec extends SparkSpec {


  test("bucketed tables join without a shuffle") {
    // spark.sql.warehouse.dir is static; the default ./spark-warehouse
    // (gitignored) serves as the bucketed-table location
    val orders = graft.core.Catalog.load(spark, sf(), "orders")
    val lineitem = graft.core.Catalog.load(spark, sf(), "lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      joined.collect()
      val shufflesBeforeAgg = planNodes(joined.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
      // the join itself must be shuffle-free: the only exchange allowed is
      // the one feeding the final aggregation
      assert(shufflesBeforeAgg.size <= 1,
        s"bucketed join should not shuffle its inputs:\n${joined.queryExecution.executedPlan}")
      // and it must produce the same result as the plain join
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(rows(joined.orderBy("o_orderstatus")) == rows(plain.orderBy("o_orderstatus")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("salted join distributes a hot key and preserves results") {
    import spark.implicits._
    // build a skewed dataset: one hot key with 10k rows + uniform tail
    val hot = Seq.fill(10000)((1L, "hot")).toDF("k", "tag")
    val tail = (2L to 500L).map(i => (i, s"t$i")).toDF("k", "tag")
    val skewed = hot.union(tail)
    val dim = (1L to 500L).map(i => (i, s"dim$i")).toDF("k", "name")
    val plain = skewed.join(dim, "k")
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", factor = 8)
    assert(salted.count() == plain.count())
    val g = salted.groupBy("k").count().orderBy(col("count").desc).head()
    assert(g.getLong(0) == 1L && g.getLong(1) == 10000L)
    // the 10k identical hot rows must actually spread across salt buckets
    // (a content-derived salt would put them all in one task); fixed
    // repartition count so the position-derived salt distribution is
    // reproducible across machines/core counts
    val buckets = hot.repartition(4).withColumn("_salt", SkewJoin.saltCol(8))
      .groupBy("_salt").count().collect()
    assert(buckets.length >= 4,
      s"hot key landed in only ${buckets.length} salt buckets")
    assert(buckets.map(_.getLong(1)).max < 10000L / 2,
      "one salt bucket still holds most of the hot key's rows")
  }

  test("AQE OptimizeSkewedJoin splits a hot partition at runtime") {
    // The SF1 soak (SCALE.md) could not observe a live skew split:
    // ScaleGen's uniform tiling preserves the fixtures' balanced key
    // distributions, so no partition ever crosses the skew threshold.
    // This spec supplies what tiling cannot — a deliberately skewed
    // relation — with the thresholds scaled to spec size (the 100 TB
    // defaults are 256 MB/64 MB; the RULE is byte-driven and identical).
    // One hot key carries ~200k padded rows (~a few MB in one hash
    // partition) against a uniform tail, broadcast disabled so the join
    // plans as SMJ: OptimizeSkewedJoin must split the hot partition and
    // mark the join, and the split must not change the result.
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // the skew decision reads COMPRESSED map-output sizes, so the hot
      // partition's payload must be incompressible — a constant pad
      // shrinks to nothing under lz4 and no partition ever looks big
      val pad = concat(md5(col("id").cast("string")),
        md5((col("id") + 1000000L).cast("string")))
      val fact = spark.range(200000).select(lit(0L).as("k"), pad.as("payload"))
        .union(spark.range(1, 33).select(col("id").as("k"), pad.as("payload")))
      val dim = spark.range(33).select(col("id").as("k"), (col("id") * 10).as("v"))
      val joined = fact.join(dim, "k")
      // execute the join's OWN plan (count() would plan a separate
      // aggregate query and leave this one un-finalized)
      val n = joined.queryExecution.toRdd.count()
      assert(n == 200000L + 32L)
      val nodes = graft.core.PlanWalk.nodes(joined.queryExecution.executedPlan)
      val facts = graft.core.PlanWalk.facts(joined.queryExecution.executedPlan)
      assert(facts.skewJoins > 0 || facts.aqeSkewReads > 0,
        s"expected a runtime skew split on the hot partition, plan:\n" +
          joined.queryExecution.executedPlan)
      // the hot partition must actually have been subdivided: the skew
      // read's partition specs outnumber the shuffle's base partitions
      val skewReads = nodes.collect {
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
          if r.hasSkewedPartition => r.partitionSpecs.size
      }
      assert(skewReads.exists(_ > 1),
        s"skew read should carry >1 partition spec for the split key, got $skewReads")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // The third AQE-era scale mechanism after skew splits and partition
    // coalescing: InjectRuntimeFilter builds a bloom filter from a
    // selectively-filtered build side and semi-filters the probe side
    // BEFORE its shuffle, cutting exchange volume on the 100 TB fact
    // scan. The rule is size-gated (probe scan must look big); zero the
    // gate so the behavior is observable at spec scale — the rewrite
    // itself is identical at the defaults.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      val part = graft.core.Catalog.load(spark, sf(), "part")
        .filter(col("p_size") === 1)
      val lineitem = graft.core.Catalog.load(spark, sf(), "lineitem")
      val joined = lineitem.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_size")).agg(count(lit(1)).as("n"))
      joined.collect()
      val tree = planNodes(joined.queryExecution.executedPlan)
        .map(_.toString).mkString("\n")
      assert(tree.contains("might_contain"),
        s"expected a bloom-filter runtime probe (might_contain) in:\n$tree")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q48 simhash pairs plan has no cartesian product") {
    val df = graft.SparkEntry.queries("q48_simhash_pairs")(spark, sf())
    df.collect()
    val bad = planNodes(df.queryExecution.executedPlan).collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty,
      s"chunk-blocked simhash pairs must join on (chunk,value), got ${bad.map(_.nodeName)}")
  }
}
