package graft.operators

import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior + plan contracts for the deterministic sampling and sequence
  * packing operators (library entry points, driven on non-fixture
  * schemas like ApiSpec does). */
class SamplingSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, s"grp${i % 7}", s"w${i % 13} " * (i % 29 + 1).toInt))
      .toDF("item_id", "grp", "body")
  }

  test("stratifiedSample returns exactly min(k, |stratum|) rows per stratum, deterministically") {
    val s1 = Sampling.stratifiedSample(corpus, "grp", "item_id", k = 11, seed = 3)
    val counts = s1.groupBy("grp").count().collect()
    assert(counts.length == 7 && counts.forall(_.getLong(1) == 11L))
    // deterministic: a second run selects the same ids
    val s2 = Sampling.stratifiedSample(corpus, "grp", "item_id", k = 11, seed = 3)
    assert(rows(s1.select("item_id").orderBy("item_id")) ==
      rows(s2.select("item_id").orderBy("item_id")))
    // a different seed selects a different set
    val s3 = Sampling.stratifiedSample(corpus, "grp", "item_id", k = 11, seed = 4)
    assert(rows(s1.select("item_id").orderBy("item_id")) !=
      rows(s3.select("item_id").orderBy("item_id")))
    // k larger than a stratum returns the whole stratum
    val tiny = corpus.filter(col("item_id") < 10)
    assert(Sampling.stratifiedSample(tiny, "grp", "item_id", k = 100).count() == 10)
  }

  test("stratifiedSample plans as a WindowGroupLimit (pre-shuffle top-k prune)") {
    val df = Sampling.stratifiedSample(corpus, "grp", "item_id", k = 5)
    df.collect()
    val nodes = planNodes(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[WindowGroupLimitExec]),
      s"expected WindowGroupLimitExec:\n${df.queryExecution.executedPlan}")
  }

  test("weightedMixture keeps weight-proportional fractions, monotone in the weight") {
    def kept(w: Double): Set[Long] =
      Sampling.weightedMixture(corpus, "grp", "item_id",
        Map("grp0" -> w), defaultWeight = 0.5, seed = 9)
        .filter(col("grp") === "grp0")
        .select("item_id").collect().map(_.getLong(0)).toSet
    val n = corpus.filter(col("grp") === "grp0").count().toDouble
    val k25 = kept(0.25); val k50 = kept(0.5); val k75 = kept(0.75)
    assert(math.abs(k50.size / n - 0.5) < 0.1,
      s"0.5 weight kept ${k50.size}/$n")
    assert(math.abs(k25.size / n - 0.25) < 0.1)
    // re-weighting only adds documents, never swaps them
    assert(k25.subsetOf(k50) && k50.subsetOf(k75))
  }

  test("weightedMixture adds no shuffle (map-side filter only)") {
    val df = Sampling.weightedMixture(corpus, "grp", "item_id",
      Map("grp0" -> 0.9), defaultWeight = 0.5)
    df.collect()
    assert(!planNodes(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ShuffleExchangeExec]))
  }

  test("splitAssign fractions are honored and stable under corpus growth") {
    val s = Sampling.splitAssign(corpus, "item_id", 0.8, 0.1, seed = 5)
    val bySplit = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bySplit("train") / 2000.0 - 0.8) < 0.05, bySplit.toString)
    assert(math.abs(bySplit("val") / 2000.0 - 0.1) < 0.05, bySplit.toString)
    // growing the corpus must not move an existing row's split: eval-set
    // contamination across dataset versions is the failure this prevents
    val grown = Sampling.splitAssign(
      corpus.limit(500), "item_id", 0.8, 0.1, seed = 5)
    val before = s.filter(col("item_id") < 500)
      .select("item_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    grown.select("item_id", "split").collect().foreach { r =>
      assert(before(r.getLong(0)) == r.getString(1),
        s"item ${r.getLong(0)} changed split when the corpus grew")
    }
  }

  test("packByTokenBudget: pack sums bounded, order preserved, partitioning-independent") {
    import spark.implicits._
    val toks = corpus.select(col("item_id"),
      size(split(col("body"), " ", -1)).cast("long").as("toks"))
    val budget = 100L
    val packed = Packing.packByTokenBudget(toks, "item_id", "toks", budget, bucketWidth = 97L)
    val packs = packed.groupBy("pack_id")
      .agg(sum("toks").as("s"), min("item_id").as("lo"), max("item_id").as("hi"))
      .collect()
    val maxDoc = toks.agg(max("toks")).head().getLong(0)
    // a pack holds at most budget + (one straddling doc's tail) tokens
    assert(packs.forall(_.getLong(1) <= budget + maxDoc),
      s"pack exceeded budget+maxDoc: ${packs.filter(_.getLong(1) > budget + maxDoc).mkString(",")}")
    // packs partition the id space into contiguous runs
    val sorted = packs.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2),
        s"packs ${a.getLong(0)} and ${b.getLong(0)} interleave ids")
      case _ =>
    }
    // the assignment is a pure function of the data, not its layout
    val repacked = Packing.packByTokenBudget(
      toks.repartition(13), "item_id", "toks", budget, bucketWidth = 97L)
    assert(rows(packed.orderBy("item_id")) == rows(repacked.orderBy("item_id")))
    // and agrees with the single-window formulation it documents
    val oracle = toks.withColumn("pack_id",
      expr("coalesce(sum(toks) over (order by item_id rows between unbounded preceding and 1 preceding), 0) div 100"))
    assert(rows(packed.orderBy("item_id")) == rows(oracle.orderBy("item_id")))
  }

  test("packByTokenBudget shuffles the wide data once: totals reuse the window exchange, no global sort") {
    val toks = corpus.select(col("item_id"),
      size(split(col("body"), " ", -1)).cast("long").as("toks"))
    val packed = Packing.packByTokenBudget(toks, "item_id", "toks", 100L, bucketWidth = 97L)
    packed.collect()
    val nodes = planNodes(packed.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[ReusedExchangeExec]),
      s"bucket totals should reuse the window's exchange:\n${packed.queryExecution.executedPlan}")
    // the only ordering ever established is within a bucket partition —
    // a global (single-range) sort of the corpus must not appear
    val globalSorts = nodes.collect { case s: SortExec if s.global => s }
    assert(globalSorts.isEmpty, s"global sort in pack plan:\n$globalSorts")
  }

  test("chunkByBudget covers every token with the declared overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 80).map(i => s"t$i").mkString(" ")), // 80 words -> 3 chunks
      (2L, "tiny doc")).toDF("doc_id", "text")
    val chunks = Packing.chunkByBudget(docs, budget = 32, overlap = 8)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = chunks.filter(_.getLong(0) == 1L)
    // stride 24: starts 0, 24, 48 — the third chunk reaches word 80, so
    // no fourth chunk is emitted (minimal cover, no redundant tail)
    assert(d1.map(_.getLong(2)).toSeq == Seq(32L, 32L, 32L))
    // consecutive chunks share exactly `overlap` words
    val w0 = d1(0).getString(3).split(" ")
    val w1 = d1(1).getString(3).split(" ")
    assert(w0.takeRight(8).toSeq == w1.take(8).toSeq)
    // full coverage in order: stitching chunks minus overlaps = the doc
    val stitched = d1.zipWithIndex.flatMap { case (r, i) =>
      val ws = r.getString(3).split(" ").toSeq
      if (i == 0) ws else ws.drop(8)
    }
    assert(stitched.toSeq == (1 to 80).map(i => s"t$i"))
    // short doc: exactly one chunk, the whole doc
    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(3) == "tiny doc")
  }

  test("temperatureMixture flattens toward low-resource strata as alpha drops") {
    import spark.implicits._
    // 1900 rows of 'big', 100 of 'small'
    val skewed = (0L until 2000L)
      .map(i => (i, if (i < 1900) "big" else "small"))
      .toDF("item_id", "src")
    def keptBySrc(alpha: Double) =
      Sampling.temperatureMixture(skewed, "src", "item_id",
        alpha = alpha, targetFrac = 0.5, seed = 3)
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nat = keptBySrc(1.0)     // alpha=1: natural proportions
    val flat = keptBySrc(0.25)   // strong flattening
    // alpha=1 keeps ~targetFrac of each stratum
    assert(math.abs(nat("big") / 1900.0 - 0.5) < 0.05, nat.toString)
    // flattening keeps ALL of the small stratum (rate capped at 1)
    assert(flat("small") == 100L, flat.toString)
    // and less of the big one than the natural mix
    assert(flat("big") < nat("big"), s"$flat vs $nat")
    // determinism: same call, same selection
    assert(keptBySrc(0.25) == flat)
  }

  test("clusterWeightedSample: one canonical per cluster, ~1/size soft keeps") {
    import spark.implicits._
    // 1 cluster of 200 copies, 1 of 10, and 300 singletons
    val docs = ((1 to 200).map(i => (i.toLong, "dup heavy")) ++
      (201 to 210).map(i => (i.toLong, "dup light")) ++
      (211 to 510).map(i => (i.toLong, s"unique text $i")))
      .toDF("doc_id", "text")
    val kept = Sampling.clusterWeightedSample(docs, "doc_id", "text", seed = 7)
      .collect()
    // every singleton survives (threshold M/1 exceeds every rank)
    assert(kept.count(_.getLong(1) == 1L) == 300)
    // each duplicate cluster keeps its canonical plus ~size·(1/size) ≈ 1
    // soft survivor — bound the tail generously, but far below the size
    val heavy = kept.filter(_.getLong(1) == 200L)
    val light = kept.filter(_.getLong(1) == 10L)
    assert(heavy.count(_.getBoolean(2)) == 1 && light.count(_.getBoolean(2)) == 1)
    assert(heavy.length >= 1 && heavy.length <= 10,
      s"200-cluster kept ${heavy.length}")
    assert(light.length >= 1 && light.length <= 5,
      s"10-cluster kept ${light.length}")
    // deterministic
    val again = Sampling.clusterWeightedSample(docs, "doc_id", "text", seed = 7)
      .collect().map(_.toSeq).toSet
    assert(again == kept.map(_.toSeq).toSet)
  }

  test("pseudoRank: Column, SQL and Scala spellings agree (negative ids too)") {
    import spark.implicits._
    val ids = Seq(-5L, -1L, 0L, 1L, 7L, 999L, 123456789L)
    val viaColumn = ids.toDF("id")
      .select(col("id"), Sampling.pseudoRank(col("id"), seed = 13).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSql = ids.toDF("id").createOrReplaceTempView("prl_ids")
    val sqlMap = spark.sql(
      s"SELECT id, ${Sampling.pseudoRankSql("id", seed = 13)} AS r FROM prl_ids")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val scala3 = Sampling.pseudoRankLong(id, seed = 13)
      assert(viaColumn(id) == scala3, s"Column vs Scala diverged at $id")
      assert(sqlMap(id) == scala3, s"SQL vs Scala diverged at $id")
    }
  }

  test("tokenBudgetCap keeps a maximal in-order prefix per domain") {
    val capped = Sampling.tokenBudgetCap(corpus, "grp", "item_id", "body",
      budgetTokens = 60L, seed = 3)
    val rows = capped.collect()
    // within budget, and every kept doc's tokens are counted
    rows.foreach(r => assert(r.getAs[Long]("cum_tokens") <= 60L))
    val byG = rows.groupBy(_.getAs[String]("grp"))
    assert(byG.nonEmpty)
    byG.foreach { case (g, ks) =>
      val keptIds = ks.map(_.getAs[Long]("item_id")).toSet
      val maxCum = ks.map(_.getAs[Long]("cum_tokens")).max
      // MAXIMAL prefix: the first dropped document in walk order would
      // have pushed the running total past the budget
      val walk = Sampling.tokenBudgetCap(corpus, "grp", "item_id", "body",
        budgetTokens = Long.MaxValue, seed = 3)
        .filter(col("grp") === g).orderBy(col("cum_tokens")).collect()
      walk.find(r => !keptIds.contains(r.getAs[Long]("item_id")))
        .foreach { firstDrop =>
          assert(maxCum + firstDrop.getAs[Long]("n_tokens") > 60L,
            s"domain $g dropped a doc that still fit the budget")
        }
    }
    // deterministic across runs
    assert(capped.collect().map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
  }

  test("weightedReservoir: exactly k, dense 1-based ranks, repartition-" +
    "invariant, inclusion monotone in the weight") {
    import spark.implicits._
    // 2000 rows, weights 1 or 20 alternating in blocks of 100
    val pop = (0L until 2000L).map(i => (i, if ((i / 100) % 2 == 0) 20L else 1L))
      .toDF("item_id", "w")
    val got = Sampling.weightedReservoir(pop, "item_id", "w", k = 300)
    val rs = got.collect()
    assert(rs.length == 300)
    assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 300))
    // repartitioning must not change the draw (pure map + exact-key top-k)
    val got2 = Sampling.weightedReservoir(pop.repartition(13), "item_id",
      "w", k = 300)
    assert(rows(got.orderBy("sel_rank")) == rows(got2.orderBy("sel_rank")))
    // A-Res property: P(include) rises with weight — the 20x-weighted half
    // must dominate the sample decisively (expected ~95% of picks)
    val heavy = rs.count(_.getLong(1) == 20L)
    assert(heavy > 240, s"heavy-weight rows under-sampled: $heavy/300")
    // weight <= 0 rows are excluded even at k > |positive|
    val withZero = Seq((1L, 0L), (2L, 5L), (3L, -1L)).toDF("item_id", "w")
    assert(Sampling.weightedReservoir(withZero, "item_id", "w", k = 10)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("weightedReservoir with equal weights reduces to the uniform " +
    "pseudoRank draw") {
    import spark.implicits._
    val pop = (0L until 500L).map(i => (i, 7L)).toDF("item_id", "w")
    val got = Sampling.weightedReservoir(pop, "item_id", "w", k = 50,
      seed = 11).select("item_id").as[Long].collect().toSet
    // equal w: ordering by ln(u)/w = ordering by u desc = pseudoRank desc
    val want = pop.select(col("item_id"),
      Sampling.pseudoRank(col("item_id"), 11L).as("r"))
      .orderBy(col("r").desc, col("item_id")).limit(50)
      .select("item_id").as[Long].collect().toSet
    assert(got == want)
  }
}
