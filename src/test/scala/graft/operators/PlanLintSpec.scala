package graft.operators

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec

/** Fleet-wide plan lint: NO declared query may execute a cartesian
  * product or nested-loop join — the plans that pass a fixture-scale gate
  * and then melt at 100 TB. Runs every entry in `SparkEntry.queries` and
  * inspects the AQE-finalized physical plan INCLUDING subquery plans
  * (a BNLJ inside a scalar subquery is just as scale-hostile). Whitelist:
  *
  *  - q10_cross_join: the cross join IS the declared operator;
  *  - q87_recursive_cte: the per-step scalar subquery joins against the
  *    recursion spine, which is ≤ 20 rows by construction — a nested
  *    loop over a bounded literal spine, not a data-scaled relation;
  *  - q57_tfidf, q107_temperature_mix, q153_dsir_sample: a 1-row global
  *    aggregate (corpus size / weight / vocabulary totals) joins onto a
  *    data-scaled relation as
  *    `crossJoin(broadcast(scalar))` — a BNLJ whose build side is
  *    exactly one row at any data scale. The broadcast scalar is the
  *    plan you want at 100 TB; the alternative (a window over an empty
  *    partition spec) funnels the relation through one partition;
  *  - qds88_quantity_slices / qds88_literal: the reference q88's own
  *    shape (composite and verbatim text) — eight cross-joined count(*)
  *    derived tables, every join side exactly one row at any data scale;
  *  - qds28_literal: same family — six cross-joined single-row
  *    aggregate buckets (the verbatim q28 text);
  *  - qds61_literal / qds90_literal: same family — the verbatim texts
  *    cross two single-row aggregate derived tables (promotional vs
  *    total sales; AM vs PM counts) to form a ratio;
  *  - qds77_literal: the verbatim q77 catalog arm is `from cs, cr` — a
  *    cross of two aggregates grouped by call-center key, so both
  *    sides are bounded by |call_center| (a fixed-size dimension) at
  *    any fact scale.
  */
class PlanLintSpec extends SparkSpec {

  private val whitelist =
    Set("q10_cross_join", "q87_recursive_cte", "q57_tfidf",
      "q107_temperature_mix", "q153_dsir_sample",
      "qds88_quantity_slices", "qds88_literal",
      "qds28_literal", "qds61_literal", "qds77_literal", "qds90_literal")

  test("no declared query plans a cartesian or nested-loop join") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => whitelist(q._1))
      .flatMap { case (name, _) =>
        val bad = executedPlanNodes(name, sf()).collect {
          case _: CartesianProductExec => "CartesianProduct"
          case b: BroadcastNestedLoopJoinExec => s"BNLJ(${b.joinType})"
        }
        if (bad.nonEmpty) Some(s"$name -> ${bad.distinct.mkString(",")}") else None
      }
    assert(offenders.isEmpty,
      s"queries with scale-hostile join plans:\n${offenders.mkString("\n")}")
  }

  /** Queries whose CONSTRUCTION legitimately moves a bounded row set to
    * the driver; every entry names the bound that keeps it scale-safe.
    * Anything else that collects during construction is the r7
    * `exactTopkRaw` bug class and must fail this lint. */
  private val sanctionedDriverCollects = Map(
    "q50_cosine_knn" -> "capped broadcast corpus (maxRows fail-fast)",
    "q51_cosine_near_dup" -> "capped broadcast corpus (maxRows fail-fast)",
    "q53_embedding_clusters" -> "pairs come from the q51 capped kernel",
    "q115_semantic_screen" -> "capped broadcast corpus (maxRows fail-fast)",
    "q52_ann_lsh" -> "1-row hyperplane seed head()",
    "q93_ann_ivf" -> "nlist x dim centroid table (Lloyd)",
    "q119_semdedup" -> "nlist x dim centroid table (Lloyd)",
    "q92_async_lookup" -> "25-row nation dimension emulating the remote store",
    "q104_upsert_sink" -> "touched-bucket id list (<= nBuckets ints)",
    // Spark's stat.countMinSketch / stat.bloomFilter build the sketch as
    // a 1-row aggregate and head() it: one fixed-size blob (~1 MB CMS,
    // ~10 bits/key Bloom) at any corpus size — the sketch IS the operator
    "q151_heavy_hitters" -> "1-row count-min sketch blob (fixed eps size)",
    "q152_bloom_decontaminate" -> "1-row Bloom blob (benchmark-sized bits)",
    // r16 watermark-sentinel streams: the helper head()s the 1-row
    // max(ts) aggregate to stamp the sentinel file — one scalar at any
    // corpus size (the Flink bounded-input MAX_WATERMARK rendering)
    "q177_sql_rank_over_windowed_subquery" -> "1-row max(ts) sentinel stamp",
    "q178_sql_rank_join_windowed_subquery" -> "1-row max(ts) sentinel stamp",
    "q180_sql_stream_measure_next" -> "1-row max(ts) sentinel stamp",
    // r16 star-contraction convergence: each round reads ONE row holding
    // (edge count, bit_xor of per-edge xxhash64) — a fixed-size scalar at
    // any corpus size, same class as the count() the lint already allows
    "q49_dup_clusters" -> "1-row (count, xxhash) convergence fingerprint")

  test("no declared query collects rows to the driver during construction") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // Dataset actions that return ROWS to the driver (Dataset.withAction
    // funcNames). "count" is deliberately allowed: it moves one long, and
    // convergence loops / corpus totals are legitimate scalar reads.
    val rowActions =
      Set("collect", "collectAsList", "toLocalIterator", "head",
        "collectToPython", "toLocalIteratorToPython")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        if (rowActions(funcName)) seen.add(funcName)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    val drain = () =>
      org.apache.spark.GraftBusWait.drain(spark.sparkContext)
    spark.listenerManager.register(listener)
    try {
      val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot(q => sanctionedDriverCollects.contains(q._1))
        .flatMap { case (name, fn) =>
          drain(); seen.clear()
          val df = fn(spark, sf())
          // materialize through the RDD, which fires no Dataset action
          // event — anything in `seen` came from the query's own code
          df.queryExecution.toRdd.count()
          drain()
          val fired = seen.toArray.map(_.toString).distinct
          if (fired.nonEmpty) Some(s"$name -> ${fired.mkString(",")}") else None
        }
      assert(offenders.isEmpty,
        "queries that collect rows to the driver during construction " +
          s"(unsanctioned):\n${offenders.mkString("\n")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("qds72's inventory join stays eligible for AQE skew splitting") {
    // The reference's own worst query (catalog_sales ⋈ inventory ⋈ dims on
    // a d1/d2/d3 week constraint) carries the widest un-broadcast join in
    // the corpus at scale; AQE must be able to split it if a week/item
    // key runs hot at 100×. OptimizeSkewedJoin only rewrites SMJ/SHJ
    // whose child shuffles carry shuffleOrigin == ENSURE_REQUIREMENTS — a
    // manual repartition() (REPARTITION_BY_COL/NUM) anywhere in the
    // pipeline would pin the partitioning and silently opt the join out.
    // Assert every shuffle is planner-inserted. (At fixture scale AQE
    // correctly demotes the joins to broadcast, so SMJ presence itself is
    // scale-dependent and not asserted; the eligibility property is.)
    import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}
    val nodes = executedPlanNodes("qds72_literal", sf("sf0.01"))
    val pinned = nodes.collect {
      case s: ShuffleExchangeExec if s.shuffleOrigin != ENSURE_REQUIREMENTS =>
        s.shuffleOrigin.toString
    }
    assert(pinned.isEmpty,
      s"qds72 contains user-pinned shuffles (AQE skew-split ineligible): $pinned")
  }

  test("q147's native rank plan pushes the filter into WindowGroupLimit") {
    // the batch route's point: each partition keeps only its top n
    // BEFORE the shuffle/final sort — without the pushdown the full
    // table crosses the window sort at 100 TB
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val nodes = executedPlanNodes("q147_sql_topn_native", sf("sf0.01"))
    assert(nodes.exists(_.isInstanceOf[WindowGroupLimitExec]),
      s"no WindowGroupLimitExec in:\n${nodes.map(_.nodeName).mkString("\n")}")
  }

  test("q148's native OVER plan is a WindowExec, no stateful operator") {
    import org.apache.spark.sql.execution.window.WindowExec
    val nodes = executedPlanNodes("q148_sql_over_native", sf("sf0.01"))
    assert(nodes.exists(_.isInstanceOf[WindowExec]),
      s"no WindowExec in:\n${nodes.map(_.nodeName).mkString("\n")}")
    assert(!nodes.exists(_.nodeName.contains("FlatMapGroupsWithState")),
      "the native batch route must not plan the stateful executor")
  }

  test("PairExistsToMinMax's aggregate plans two-phase (map-side combine)") {
    // The rewrite's whole point at scale is that the hot order key
    // becomes an ORDINARY skewed aggregate: partial min/max must combine
    // map-side before the key shuffle, or the hot key's rows would all
    // cross the wire to one reducer. Assert the physical plan carries a
    // partial-mode HashAggregate below a final-mode one for the rewrite's
    // min/max columns.
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_suppkey").as("w"))
    val pairs = {
      val b = li.select(col("k").as("k2"), col("w").as("w2"))
      li.as("a").join(b, col("a.k") === col("k2") &&
        col("a.w") =!= col("w2")).select(col("a.k"))
    }
    val probe = spark.read.parquet(s"${sf()}/orders.parquet")
      .select(col("o_orderkey"))
      .join(pairs, col("o_orderkey") === col("k"), "left_semi")
    spark.conf.set(graft.plans.PairExistsToMinMax.FLAG, "true")
    try {
      probe.collect()
      val nodes = planNodes(probe.queryExecution.executedPlan)
      // the rewrite fired: its alias appears in some aggregate's output
      assert(nodes.collect { case h: HashAggregateExec if
        h.resultExpressions.exists(_.name.contains("__graft_min_w")) => h
      }.nonEmpty, "rewrite did not fire (no __graft_min_w aggregate)")
      // and the only aggregates in this plan are the rewrite's min/max —
      // they must plan as Partial (map-side) + Final around the shuffle
      val modes = nodes.collect { case h: HashAggregateExec =>
        h.aggregateExpressions.map(_.mode).distinct
      }
      assert(modes.exists(_.contains(Partial)) && modes.exists(_.contains(Final)),
        s"rewrite aggregate is not two-phase: modes per node = $modes")
    } finally spark.conf.unset(graft.plans.PairExistsToMinMax.FLAG)
  }
}
