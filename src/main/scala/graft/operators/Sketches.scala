package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}

/** Sketch-accelerated exact operators: a bounded-memory summary built in
  * one pass prunes the shuffle-side work, and a second exact pass over
  * the survivors confirms — so every declared result is EXACT (the
  * sketch only ever removes rows that provably cannot qualify), while
  * the shuffle that dominates at 100 TB carries candidates instead of
  * the whole keyspace.
  *
  * Reference scope: the reference engine ships no sketch operators (its
  * nearest relative is HLL++ NDV estimation inside the planner's
  * statistics); corpus-scale heavy-hitter and membership pruning are
  * part of this library's LLM-pipeline extension surface (SURVEY.md
  * "beyond the reference" list), following Cormode/Muthukrishnan's
  * count-min sketch (J. Algorithms '05) and the classic Bloom
  * semi-join.
  *
  * Why this shape survives 100×: a naive heavy-hitter query shuffles
  * every (term, partial-count) pair — vocabulary-sized, which for web
  * text grows with the corpus (Heaps' law). The count-min pass is
  * map-side only (a treeAggregate of fixed-size integer arrays to the
  * driver), and the rebroadcast sketch turns the exact pass's shuffle
  * into candidates-only. Likewise the Bloom pass ships bits instead of
  * 8-byte hashes: a benchmark set too big to broadcast as an exact hash
  * relation (the [[Corpus.decontaminate]] path) still fits as a filter
  * at ~10 bits/key, and only corpus shingles that might match ever
  * reach the join shuffle.
  */
object Sketches {

  def defs: Seq[QueryDef] =
    Seq(q151HeavyHitters, q152BloomDecontaminate, q153DsirSample,
      q155WindowedHeavyHitters)

  /** Exact heavy hitters over a column, count-min pruned.
    *
    * Pass 1 folds the whole multiset into a count-min sketch (depth×width
    * integer grid, ~1 MB at eps 1e-4 — driver- and broadcast-safe at any
    * corpus size) whose `totalCount` also supplies the exact occurrence
    * total. Pass 2 keeps only values the sketch estimates at or above the
    * threshold — count-min NEVER underestimates (each cell is a sum of
    * true counts, the estimate is the min over `depth` cells), so the
    * candidate set is a guaranteed superset of the true heavy hitters at
    * ANY eps — and exact-counts just those, re-applying the threshold so
    * sketch overestimates cannot leak a light term into the result.
    *
    * @param den a value is heavy iff cnt * den >= total (threshold 1/den
    *            of all occurrences) */
  def heavyHitters(values: DataFrame, valueCol: String, den: Long = 200L,
      eps: Double = 1e-4): DataFrame = {
    require(den >= 1, s"den must be >= 1: $den")
    val spark = values.sparkSession
    val v = values.select(col(valueCol).as("term"))
    // one map-side pass; the merged sketch is the only thing that moves
    val cms = v.stat.countMinSketch("term", eps, 0.99, 42)
    val total = cms.totalCount // exact: an adder, not an estimate
    val bc = spark.sparkContext.broadcast(cms)
    // ceil(total/den): smallest integer cnt with cnt*den >= total
    val thr = (total + den - 1) / den
    val mightBeHeavy = udf((s: String) =>
      s != null && bc.value.estimateCount(s) >= thr)
    v.filter(mightBeHeavy(col("term")))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * den >= total)
      .orderBy(col("cnt").desc, col("term"))
  }

  /** Exact decontamination with a Bloom-pruned corpus side.
    *
    * Same contract as [[Corpus.decontaminate]] (training documents
    * sharing ≥1 word n-gram with the held-out set, with the distinct
    * shared count), but built for the regime where the held-out side is
    * too large to broadcast as an exact hash relation: its shingle-hash
    * set becomes a Bloom filter (~10 bits/key at fpp 1e-2 — 20× smaller
    * than the 8-byte-hash relation), the corpus side drops every shingle
    * the filter rejects MAP-SIDE, and only survivors (true matches plus
    * the fpp sliver) reach the exact equi-join that confirms. Bloom has
    * no false negatives, so the join sees every true match; the join
    * discards the Bloom false positives. Exactness is relative to the
    * 64-bit shingle hash, same as [[Corpus.decontaminate]]: the confirm
    * join keys on `xxhash64(shingle)`, so a 64-bit collision can claim
    * one spurious shared n-gram — vanishing at benchmark-set scale. */
  def bloomDecontaminate(training: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 6,
      fpp: Double = 0.01): DataFrame = {
    val spark = training.sparkSession
    val trainSh = Dedup.hashedShingles(training, idCol, textCol, n)
      .select(col("doc_id"), col("h").as("sh"))
    val benchSh = Dedup.hashedShingles(benchmark, idCol, textCol, n)
      .select(col("h").as("sh")).distinct()
    // the benchmark side is held-out-set-sized: one exact count is cheap
    // and sizes the filter (expectedNumItems only tunes fpp, never
    // correctness)
    val nBench = math.max(benchSh.count(), 1L)
    val bf = benchSh.stat.bloomFilter("sh", nBench, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val mightMatch = udf((h: Long) => bc.value.mightContainLong(h))
    trainSh.filter(mightMatch(col("sh")))
      .join(benchSh, Seq("sh")) // exact confirm: kills the fpp sliver
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** DSIR-style importance resampling (Xie et al., NeurIPS'23): select
    * the k raw documents whose word distribution most resembles a target
    * slice, by Gumbel-top-k over log importance weights.
    *
    * Per word w: logratio(w) = ln p_target(w) − ln p_raw(w) under
    * add-one smoothing over the shared vocabulary; per raw document:
    * weight = Σ_occurrences logratio. Sampling ∝ exp(weight) without
    * replacement is equivalent to top-k of weight + Gumbel noise
    * (Vieira'14); the noise derives from [[Sampling.pseudoRank]] so the
    * draw is reproducible across runs, engines and partitionings —  the
    * property that makes two 100 TB pipeline runs select the same
    * training set.
    *
    * Determinism discipline: each per-word logratio and each per-doc
    * Gumbel perturbation is rounded once to 6 decimals and fixed as a
    * DECIMAL; the per-doc weight is then an EXACT decimal sum —
    * associative, so identical under any partitioning or engine, where
    * a double sum of logs would drift by merge order. Distribution
    * tables are vocabulary-sized (sublinear in the corpus, Heaps' law)
    * and join map-side once AQE sees their size; the final top-k is a
    * TakeOrderedAndProject, never a global sort. */
  def dsirSample(docs: DataFrame, sourceCol: String = "source",
      targetSource: String = "src0", idCol: String = "doc_id",
      textCol: String = "text", k: Int = 100, seed: Long = 7L): DataFrame = {
    val dec = DecimalType(18, 6)
    val words = docs.select(col(idCol).as("doc_id"),
      (col(sourceCol) === targetSource).as("is_t"),
      explode(split(col(textCol), " ", -1)).as("term"))
    val stats = words.agg(
      countDistinct(col("term")).as("v"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("nr"))
    val tc = words.groupBy(col("term")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
    // 1-row stats side: bounded by construction (PlanLintSpec whitelist)
    val lr = tc.crossJoin(broadcast(stats)).select(col("term"),
      round(log((col("ct") + 1.0) / (col("nt") + col("v"))) -
        log((col("cr") + 1.0) / (col("nr") + col("v"))), 6)
        .cast(dec).as("logratio"))
    val tf = words.filter(!col("is_t"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val wts = tf.join(lr, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf").cast(DecimalType(10, 0)) * col("logratio"))
        .as("weight"))
    // u in (0,1): exact dyadic rational, so ln(u) agrees across engines
    val u = (Sampling.pseudoRank(col("doc_id"), seed) + 1)
      .cast(DoubleType) / 2147483648.0
    val keyed = wts.withColumn("skey",
      col("weight") + round(-log(-log(u)), 6).cast(dec))
    keyed
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k) // TakeOrderedAndProject: k rows, no global sort
      .withColumn("sel_rank",
        row_number().over(Window.orderBy(col("skey").desc, col("doc_id"))))
      .select(col("doc_id"), col("weight").cast(DoubleType).as("weight"),
        col("sel_rank"))
      .orderBy(col("sel_rank"))
  }

  /** Exact heavy hitters PER EVENT-TIME WINDOW, batch or streaming from
    * the same code: per-window term counts and per-window totals are two
    * watermark-bounded window aggregates whose append outputs join on
    * the window column — the chained-stateful shape Structured Streaming
    * executes in one continuous query (two shuffles keyed by
    * (window, term) and (window); the totals side is #windows-sized, so
    * the join broadcasts at any data scale). A term is emitted for a
    * window iff cnt * den >= the window's total, exactly — results
    * append once per closed window and match the batch collapse as a
    * multiset. State is watermark-bounded on all three operators; a
    * window that closes leaves nothing behind. */
  def windowedHeavyHitters(df: DataFrame, tsCol: String, termCol: String,
      dur: String = "1 hour", den: Long = 4L,
      delay: String = "0 seconds"): DataFrame = {
    require(den >= 1, s"den must be >= 1: $den")
    val src = if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    val counts = src
      .groupBy(window(col(tsCol), dur).as("win"), col(termCol).as("term"))
      .agg(count(lit(1)).as("cnt"))
    val totals = src.groupBy(window(col(tsCol), dur).as("win"))
      .agg(count(lit(1)).as("total"))
    counts.join(totals, Seq("win"))
      .filter(col("cnt") * den >= col("total"))
      .select(col("win").getField("start").as("win_start"),
        col("term"), col("cnt"))
  }

  /** Terms covering ≥ 1/200 of all occurrences, exactly. */
  val q151HeavyHitters: QueryDef = QueryDef("q151_heavy_hitters",
    """WITH words AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |SELECT term, cnt FROM (
      |  SELECT term, count(*) AS cnt FROM words GROUP BY term)
      |WHERE cnt * 200 >= (SELECT count(*) FROM words)
      |ORDER BY cnt DESC, term""".stripMargin) { (spark, dir) =>
    heavyHitters(
      Tables(spark, dir).documents.select(
        explode(split(col("text"), " ", -1)).as("term")),
      "term")
  }

  /** Decontaminate against the src1 slice (4-gram overlap), Bloom-pruned
    * — the non-broadcastable-benchmark sibling of q78. */
  val q152BloomDecontaminate: QueryDef = QueryDef("q152_bloom_decontaminate",
    """WITH words AS (
      |  SELECT doc_id, source,
      |    unnest(string_split(text, ' ')) AS w,
      |    generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id, source,
      |    w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |    lead(w, 3) OVER win AS shingle
      |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
      |sh AS (SELECT DISTINCT doc_id, source, shingle FROM sh0 WHERE shingle IS NOT NULL),
      |b AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src1')
      |SELECT doc_id, count(*) AS n_shared_ngrams
      |FROM (SELECT doc_id, shingle FROM sh WHERE source <> 'src1') t
      |JOIN b USING (shingle)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir).documents
    bloomDecontaminate(
      docs.filter(col("source") =!= "src1"),
      docs.filter(col("source") === "src1"), n = 4)
      .orderBy(col("doc_id"))
  }

  /** Top-100 raw documents by DSIR importance toward the src0 slice. */
  val q153DsirSample: QueryDef = QueryDef("q153_dsir_sample",
    s"""WITH words AS (
       |  SELECT doc_id, source = 'src0' AS is_t,
       |    unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |stats AS (
       |  SELECT count(DISTINCT term) AS v,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt,
       |    sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS nr
       |  FROM words),
       |tc AS (
       |  SELECT term,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
       |    sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS cr
       |  FROM words GROUP BY term),
       |lr AS (
       |  SELECT term,
       |    CAST(round(ln((ct + 1.0) / (nt + v)) - ln((cr + 1.0) / (nr + v)), 6)
       |      AS DECIMAL(18,6)) AS logratio
       |  FROM tc CROSS JOIN stats),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM words
       |  WHERE NOT is_t GROUP BY doc_id, term),
       |wts AS (
       |  SELECT doc_id, sum(CAST(tf AS DECIMAL(10,0)) * logratio) AS weight
       |  FROM tf JOIN lr USING (term) GROUP BY doc_id),
       |keyed AS (
       |  SELECT doc_id, weight,
       |    weight + CAST(round(-ln(-ln(
       |      (${graft.operators.Sampling.pseudoRankSql("doc_id", 7L)} + 1.0)
       |        / 2147483648.0)), 6) AS DECIMAL(18,6)) AS skey
       |  FROM wts)
       |SELECT doc_id, CAST(weight AS DOUBLE) AS weight, sel_rank FROM (
       |  SELECT doc_id, weight,
       |    row_number() OVER (ORDER BY skey DESC, doc_id) AS sel_rank
       |  FROM keyed)
       |WHERE sel_rank <= 100 ORDER BY sel_rank""".stripMargin) {
    (spark, dir) => dsirSample(Tables(spark, dir).documents)
  }

  /** Event types covering ≥ 1/4 of each hour's events — the batch
    * collapse of the streaming windowed-heavy-hitter query. */
  val q155WindowedHeavyHitters: QueryDef = QueryDef("q155_windowed_heavy",
    """WITH w AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
      |         event_type AS term
      |  FROM events),
      |c AS (SELECT win_start, term, count(*) AS cnt FROM w GROUP BY 1, 2),
      |t AS (SELECT win_start, count(*) AS total FROM w GROUP BY 1)
      |SELECT win_start, term, cnt FROM c JOIN t USING (win_start)
      |WHERE cnt * 4 >= total
      |ORDER BY win_start, term""".stripMargin) { (spark, dir) =>
    windowedHeavyHitters(Tables(spark, dir).events, "ts", "event_type",
      dur = "1 hour", den = 4L)
      .orderBy(col("win_start"), col("term"))
  }
}
