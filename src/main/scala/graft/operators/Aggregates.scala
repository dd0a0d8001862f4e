package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}

/** UDTF / UDAF surface (SURVEY.md §2.10): table functions via
  * explode/LATERAL (reference TableFunction + LogicalUnnestRule →
  * Catalyst Generator), collection aggregates (CollectAggFunction /
  * ListAggFunction), a user-defined typed [[Aggregator]] (reference
  * AggregateFunction<T,ACC> contract: accumulate/merge/getValue), and
  * HLL++ approximate count-distinct (reference
  * ApproximateCountDistinctAggFunction — Spark ships the same HLL++).
  */
object Aggregates {

  def defs: Seq[QueryDef] = Seq(
    q37LateralExplode, q38CollectAgg, q39WeightedAvgUdaf, q64ApproxDistinct,
    q80FilterClause, q79OrdinalUnnest, q84ApproxPercentile,
    q112SplitDistinct, q165SqlUnnest, q168SqlLateralUdtf)

  /** Split-distinct-agg skew rewrite (reference
    * SplitAggregateRule.scala:108, flag
    * `table.optimizer.distinct-agg.split.enabled`): COUNT(DISTINCT x)
    * GROUP BY k with a hot k melts one reducer — one state cell absorbs
    * every distinct x of the hot key. The rewrite inserts a bucket level:
    * level 1 groups by (k, hash(x) % nBuckets) so each hot key's distinct
    * set spreads over nBuckets cells, level 2 sums the per-bucket distinct
    * counts — EXACT, because the buckets partition the distinct values of
    * x (a value always lands in the same bucket, so no distinct value is
    * counted twice and none straddles buckets). Works on batch frames
    * and, windowed ([[splitDistinctCountWindowed]]), on streams. */
  def splitDistinctCount(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], distinctCol: String,
      nBuckets: Int = 16): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    df.groupBy((groupCols.map(col) :+
        pmod(xxhash64(col(distinctCol)), lit(nBuckets.toLong)).as("__dbucket")): _*)
      .agg(count_distinct(col(distinctCol)).as("__pd"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__pd")).as("n_distinct"))
  }

  /** Streaming form of the split rewrite over event-time tumbling
    * windows. Spark refuses COUNT(DISTINCT) on a stream outright, so the
    * rewrite goes one level deeper than the reference's: distinctness
    * becomes a streaming DEDUP on (window, key, value) — whose state
    * spreads by the full dedup key, so a hot key's distinct set never
    * concentrates in one cell (the skew the reference's rule exists to
    * melt) and whose entries evict with the watermark (the window column
    * carries the event time) — then a per-(window, key, bucket) count of
    * the deduped rows IS the per-bucket distinct count, and the chained
    * level-2 aggregation sums buckets per key. Exact, and collapses to
    * the same result as [[splitDistinctCount]] in batch. */
  def splitDistinctCountWindowed(events: org.apache.spark.sql.DataFrame,
      tsCol: String, keyCol: String, distinctCol: String,
      window: String, delay: String,
      nBuckets: Int = 16): org.apache.spark.sql.DataFrame =
    events
      .withWatermark(tsCol, delay)
      .select(org.apache.spark.sql.functions.window(col(tsCol), window)
          .as("window"),
        col(keyCol), col(distinctCol),
        pmod(xxhash64(col(distinctCol)), lit(nBuckets.toLong)).as("__dbucket"))
      .dropDuplicates("window", keyCol, distinctCol)
      .groupBy(col("window"), col(keyCol), col("__dbucket"))
      .agg(count(lit(1)).as("__pd"))
      .groupBy(col("window"), col(keyCol))
      .agg(sum(col("__pd")).as("n_distinct"))

  /** Split-distinct rewrite over the events table, collapsed to batch:
    * distinct values seen per (user, hour window) — the oracle states the
    * plain COUNT(DISTINCT), the engine runs the two-level rewrite, and
    * exactness makes them hash-equal. */
  val q112SplitDistinct: QueryDef = QueryDef("q112_split_distinct",
    """SELECT user_id,
      |  epoch_us(ts) - (epoch_us(ts) % 3600000000) AS w_start_us,
      |  count(DISTINCT value) AS n_distinct
      |FROM events
      |GROUP BY 1, 2 ORDER BY user_id, w_start_us""".stripMargin) {
    (spark, dir) =>
      val ev = Tables(spark, dir).events
        .withColumn("__ts", col("ts"))
      splitDistinctCountWindowed(ev, "__ts", "user_id", "value",
        window = "1 hour", delay = "0 seconds")
        .select(col("user_id"),
          (unix_micros(col("window.start"))).as("w_start_us"),
          col("n_distinct"))
        .orderBy(col("user_id"), col("w_start_us"))
  }

  /** UDTF: explode words laterally, global top-50 word frequencies. */
  val q37LateralExplode: QueryDef = QueryDef("q37_lateral_explode",
    """SELECT w AS word, count(*) AS n
      |FROM documents, unnest(string_split(text, ' ')) AS t(w)
      |GROUP BY w
      |ORDER BY n DESC, word
      |LIMIT 50""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.documents
      .select(explode(split(col("text"), " ", -1)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50)
  }

  /** Collection aggregates: sorted collect_list (multiset-deterministic)
    * and LISTAGG with sorted elements (reference ListAggFunction /
    * CollectAggFunction). The gate output serializes the collected
    * arrays as CSV — the driver's pandas comparator can't hash raw array
    * cells — with cardinalities pinned alongside; AggregatesSpec exercises
    * the raw array forms. */
  val q38CollectAgg: QueryDef = QueryDef("q38_collect_agg",
    """SELECT c_nationkey,
      |  string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments_csv,
      |  CAST(len(list(c_mktsegment)) AS BIGINT) AS n_segments,
      |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS uniq_segments_csv,
      |  CAST(len(list(DISTINCT c_mktsegment)) AS BIGINT) AS n_uniq
      |FROM customer WHERE c_custkey <= 100
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.filter(col("c_custkey") <= 100)
      .groupBy(col("c_nationkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("c_mktsegment")))).as("segments_csv"),
        size(collect_list(col("c_mktsegment"))).cast(LongType).as("n_segments"),
        concat_ws(",", sort_array(collect_set(col("c_mktsegment")))).as("uniq_segments_csv"),
        size(collect_set(col("c_mktsegment"))).cast(LongType).as("n_uniq"))
      .orderBy(col("c_nationkey"))
  }

  /** Typed UDAF, the reference's AggregateFunction<T, ACC> contract
    * (accumulate / merge / getValue) as a Catalyst-planned [[Aggregator]]:
    * quantity-weighted mean of line number. Accumulates integral values so
    * the double sums are exact and order-independent — safe under any
    * partial-aggregation schedule. */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0) Double.NaN else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val q39WeightedAvgUdaf: QueryDef = QueryDef("q39_weighted_avg_udaf",
    """SELECT l_returnflag,
      |  SUM(l_linenumber * l_quantity) / SUM(l_quantity) AS weighted_linenumber
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val wavg = udaf(WeightedAvg)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_linenumber").cast(DoubleType), col("l_quantity"))
        .as("weighted_linenumber"))
      .orderBy(col("l_returnflag"))
  }

  /** HLL++ approximate count-distinct (reference HyperLogLogPlusPlus.java;
    * Spark's approx_count_distinct is the same sketch). Sketch internals
    * differ across engines, so the gate is rows-only; the spec bounds the
    * error vs the exact count. */
  /** HLL++ approx count-distinct (reference uses the same HLL++ sketch).
    * DuckDB's HLL differs, so the estimate itself cannot be oracled —
    * instead the driver row hash-checks a deterministic projection: the
    * EXACT distinct count (SQL-computable) plus a boolean that the HLL++
    * estimate landed within 3× its configured rsd (0.05). The estimate is
    * deterministic for fixed data, so a sketch regression flips the flag
    * and the row goes red; the tight error-curve assertions stay in
    * `AggregatesSpec`-land. */
  val q64ApproxDistinct: QueryDef = QueryDef("q64_approx_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS approx_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.05).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts"))
          .cast(DoubleType) / col("exact_parts") <= 0.15).as("approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** FILTER-clause aggregates (SQL:2003; both engines support the same
    * syntax — Spark plans them as conditional aggregates). */
  val q80FilterClause: QueryDef = QueryDef("q80_filter_clause",
    """SELECT o_orderstatus,
      |  COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total,
      |  MIN(o_orderkey) FILTER (WHERE o_totalprice > 150000) AS first_big
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    graft.core.Catalog.registerAnalyzed(spark, dir)
    spark.sql(
      """SELECT o_orderstatus,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total,
        |  MIN(o_orderkey) FILTER (WHERE o_totalprice > 150000) AS first_big
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
  }

  /** UNNEST WITH ORDINALITY parity: positional explode of the embedding
    * arrays (reference LogicalUnnestRule; Spark posexplode). */
  val q79OrdinalUnnest: QueryDef = QueryDef("q79_ordinal_unnest",
    """SELECT vec_id, i, v
      |FROM (SELECT vec_id,
      |        unnest(embedding) AS v,
      |        generate_subscripts(embedding, 1) AS i
      |      FROM embeddings)
      |WHERE vec_id < 5 AND i <= 8
      |ORDER BY vec_id, i""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "v")))
      .select(col("vec_id"), (col("i0") + 1).cast(LongType).as("i"), col("v"))
      .filter(col("i") <= 8)
      .orderBy(col("vec_id"), col("i"))
  }

  /** The reference's `UNNEST` SQL spelling through the single front door
    * (r13 — reference SqlITCase.scala:551-705 forms; rewritten to
    * Spark's `LATERAL explode` by [[graft.streaming.UnnestSql]]); q79
    * pins the DataFrame/posexplode path, this pins the TEXT path. */
  val q165SqlUnnest: QueryDef = QueryDef("q165_sql_unnest",
    """SELECT vec_id, unnest(embedding) AS v
      |FROM embeddings
      |WHERE vec_id < 50
      |ORDER BY vec_id, v""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).embeddings.createOrReplaceTempView("embeddings")
    graft.Sql.sql(spark,
      """SELECT vec_id, v
        |FROM embeddings, UNNEST(embeddings.embedding) AS A (v)
        |WHERE vec_id < 50
        |ORDER BY vec_id, v""".stripMargin)
  }

  /** The reference's UDTF `LATERAL TABLE(fn(x))` spelling through the
    * front door (r13 — stream CorrelateITCase.scala:150-163; rewritten
    * to `LATERAL explode` over an array-returning scalar UDF by
    * [[graft.streaming.TemporalSql]]'s generic lateral branch). */
  val q168SqlLateralUdtf: QueryDef = QueryDef("q168_sql_lateral_udtf",
    """SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |FROM documents
      |WHERE doc_id < 200
      |ORDER BY doc_id, tok""".stripMargin) { (spark, dir) =>
    Tables(spark, dir).documents.createOrReplaceTempView("documents")
    spark.udf.register("tok_split", (s: String) => s.split(" ", -1))
    graft.Sql.sql(spark,
      """SELECT doc_id, tok
        |FROM documents, LATERAL TABLE(tok_split(text)) AS A (tok)
        |WHERE doc_id < 200
        |ORDER BY doc_id, tok""".stripMargin)
  }

  /** Approximate percentile sketch (Spark's percentile_approx; the
    * companion to HLL in the sketch family — reference ships only HLL, this
    * is an LLM-pipeline extension). Sketch output is engine-specific →
    * rows-only gate; the spec bounds its error against the exact
    * PERCENTILE_CONT of q82. */
  /** Approximate percentile (reference/Spark: KLL-family rank sketch at
    * accuracy 1000 → rank error ≤ 0.001·n). The approx VALUES differ
    * across sketch implementations, so the driver row hash-checks the
    * rank-error CONTRACT instead: re-rank each approximate percentile
    * against the actual data and flag whether its realized rank fraction
    * is within the (generous, tie-padded) band around the target. The
    * oracle states the contract as constants — a sketch regression flips
    * a flag and the row goes red. */
  val q84ApproxPercentile: QueryDef = QueryDef("q84_approx_percentile",
    """SELECT l_returnflag, count(*) AS n_rows,
      |  TRUE AS p50_rank_ok, TRUE AS p99_rank_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val approx = t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("p99_approx"))
    t.lineitem
      .join(broadcast(approx), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        // ties counted separately and credited at HALF weight: the
        // midpoint rank (strictly-below + equal/2) is the value's rank
        // regardless of how much tie mass sits exactly at the returned
        // percentile, so a fixture that duplicates the approx-median
        // price cannot push the fraction past the band (a plain <= count
        // jumps by the whole tie mass and false-positives the contract)
        sum(when(col("l_extendedprice") < col("p50_approx"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_extendedprice") === col("p50_approx"), 1L).otherwise(0L)).as("eq50"),
        sum(when(col("l_extendedprice") < col("p99_approx"), 1L).otherwise(0L)).as("lt99"),
        sum(when(col("l_extendedprice") === col("p99_approx"), 1L).otherwise(0L)).as("eq99"))
      .select(col("l_returnflag"), col("n_rows"),
        ((col("lt50") + col("eq50").cast(DoubleType) / 2) / col("n_rows"))
          .between(0.49, 0.51).as("p50_rank_ok"),
        ((col("lt99") + col("eq99").cast(DoubleType) / 2) / col("n_rows"))
          .between(0.98, 1.0).as("p99_rank_ok"))
      .orderBy(col("l_returnflag"))
  }
}
