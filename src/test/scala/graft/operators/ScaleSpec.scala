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
