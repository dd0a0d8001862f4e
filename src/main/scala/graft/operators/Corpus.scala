package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}

/** Corpus-level lexical operators for training-data curation: TF-IDF
  * term scoring, vocabulary extraction, and benchmark decontamination
  * (n-gram overlap against a held-out evaluation set).
  *
  * All three are compositions of built-in relational operators — explode,
  * two-phase aggregation, broadcast scalar, windowed top-k — chosen so
  * each stage's shuffle key is the natural data key (term or doc) and
  * the corpus is never collected or globally sorted.
  */
object Corpus {

  def defs: Seq[QueryDef] =
    Seq(q57Tfidf, q59VocabTopK, q78Decontaminate, q103SharedSpans)

  /** (doc, term, tf) from an (id, text) frame: one explode + one
    * count aggregate, shuffled on (doc, term). */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ", -1)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Smoothed TF-IDF (`tf · (ln((N+1)/(df+1)) + 1)`), top `k` terms per
    * document. Document frequency is one aggregate over the tf relation
    * (already distinct per (doc, term)); the corpus size joins in as a
    * 1-row broadcast; the per-doc top-k is a rank bounded by a constant,
    * which plans as a WindowGroupLimit — candidates prune before the
    * shuffle, the 100 TB posting list is never sorted whole. Scores are
    * rounded to 6 dp: JVM and libm `ln` differ in the final ulp. */
  def tfidfTopTerms(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") *
        (log((col("n_docs") + lit(1)).cast(DoubleType) / (col("df") + lit(1))) + lit(1)), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("term_rank", row_number().over(w).cast(LongType))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("score"), col("term_rank"))
  }

  /** Corpus vocabulary: term → total occurrences + document frequency,
    * top `k` by count. The limit after the sort plans as a top-k heap
    * (TakeOrderedAndProject) over the term-count relation — partial
    * per-partition heaps, never a full sort of the vocabulary. */
  def vocabulary(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 50): DataFrame =
    termFrequencies(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("n_occurrences"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term"))
      .limit(k)

  /** Benchmark decontamination: training documents sharing at least one
    * word `n`-gram with any document of the held-out set, with the count
    * of distinct shared n-grams. The held-out shingle set is deduplicated
    * BEFORE the join (its size is benchmark-scale, not corpus-scale), so
    * the join is an equi-join of corpus shingles against a small
    * relation — at 100 TB this broadcasts; the corpus side stays where
    * it is. The join key is `xxhash64(shingle)`, not the n-gram text:
    * an 8-word shingle is ~50 bytes where the hash is 8, so the
    * benchmark broadcast and the corpus-side join payload shrink ~6×
    * (same trade as the dedup family; a 64-bit collision can claim one
    * spurious shared n-gram — vanishing at benchmark-set scale). */
  def decontaminate(training: DataFrame, benchmark: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 8): DataFrame = {
    val trainSh = Dedup.hashedShingles(training, idCol, textCol, n)
      .select(col("doc_id"), col("h").as("sh"))
    val benchSh = Dedup.hashedShingles(benchmark, idCol, textCol, n)
      .select(col("h").as("sh")).distinct()
    trainSh.join(benchSh, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** Top-3 TF-IDF terms per document. */
  val q57Tfidf: QueryDef = QueryDef("q57_tfidf",
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf,
      |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1), 6) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tf, score, term_rank FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, term) AS term_rank
      |  FROM scored)
      |WHERE term_rank <= 3 ORDER BY doc_id, term_rank""".stripMargin) {
    (spark, dir) =>
      tfidfTopTerms(Tables(spark, dir).documents)
        .orderBy(col("doc_id"), col("term_rank"))
  }

  /** Top-50 corpus vocabulary with document frequencies. */
  val q59VocabTopK: QueryDef = QueryDef("q59_vocab_topk",
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2)
      |SELECT term, CAST(sum(tf) AS BIGINT) AS n_occurrences, count(*) AS n_docs
      |FROM tf GROUP BY term
      |ORDER BY n_occurrences DESC, term LIMIT 50""".stripMargin) {
    (spark, dir) => vocabulary(Tables(spark, dir).documents)
  }

  /** Decontaminate the corpus against the src0 slice as the stand-in
    * held-out benchmark: 8-gram overlap. */
  val q78Decontaminate: QueryDef = QueryDef("q78_decontaminate",
    """WITH words AS (
      |  SELECT doc_id, source,
      |    unnest(string_split(text, ' ')) AS w,
      |    generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id, source,
      |    w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
      |    lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
      |    lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' ' ||
      |    lead(w, 7) OVER win AS shingle
      |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
      |sh AS (SELECT DISTINCT doc_id, source, shingle FROM sh0 WHERE shingle IS NOT NULL),
      |b AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0')
      |SELECT doc_id, count(*) AS n_shared_ngrams
      |FROM (SELECT doc_id, shingle FROM sh WHERE source <> 'src0') t
      |JOIN b USING (shingle)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir).documents
    decontaminate(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"))
      .orderBy(col("doc_id"))
  }

  /** Winnowed fingerprints per document (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03): hash every word `n`-gram, keep the minimum hash of each
    * sliding window of `w` consecutive positions, dedup. Winnowing is
    * content-defined, so the kept positions align ACROSS documents —
    * unlike stride sampling, which breaks cross-document alignment —
    * giving the guarantee that any shared word run of length
    * ≥ n + w - 1 contributes at least one shared fingerprint, at
    * ~2/(w+1) of the full shingle density. This is the scale path for
    * exact-substring dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"): the full-density inverted index
    * is linear in corpus size, the winnowed one is a constant fraction
    * of it with a detection-length guarantee instead of silent loss. */
  def winnowedFingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 6, w: Int = 4): DataFrame = {
    require(n >= 1, s"shingle length must be >= 1: $n")
    require(w >= 1, s"winnowing window must be >= 1: $w")
    val win = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val hashes = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ", -1)).as(Seq("i", "wd")))
      .withColumn("shingle",
        concat_ws(" ", (0 until n).map(k => lead(col("wd"), k).over(win)): _*))
      .filter(size(split(col("shingle"), " ", -1)) === n)
      .select(col("doc_id"), col("i"),
        graft.functions.GraftFunctions.hashCode(col("shingle"))
          .cast(LongType).as("h"))
    // winnowing spec keeps full windows only: a count guard drops the
    // trailing positions whose lookahead is truncated
    val fpWin = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, w - 1)
    hashes
      .withColumn("fp", min(col("h")).over(fpWin))
      .withColumn("nf", count(col("h")).over(fpWin))
      .filter(col("nf") === w)
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** The same fingerprint set as [[winnowedFingerprints]], computed as
    * pure per-document array algebra inside the scan projection — no
    * shuffle of the exploded shingle relation at all (the window
    * formulation exchanges and sorts every shingle on doc_id; this one's
    * first exchange downstream carries only the winnowed ~2/(w+1)
    * density). Measured trade at sf0.1, local[32]: the higher-order
    * lambdas evaluate interpreted per element, costing ~1.3× the
    * codegen'd window pipeline's wall time — so the window variant is
    * the default and this is the alternative for deployments where the
    * shingle exchange, not CPU, is the bottleneck (wide docs, congested
    * network, corpus ≫ cluster memory). `CorpusSpec` pins set equality
    * between the two. */
  def winnowedFingerprintsShuffleFree(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 6, w: Int = 4): DataFrame = {
    require(n >= 1, s"shingle length must be >= 1: $n")
    require(w >= 1, s"winnowing window must be >= 1: $w")
    val words = split(col(textCol), " ", -1)
    val emptyLongs = array().cast(ArrayType(LongType))
    val shingleHashes = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => graft.functions.GraftFunctions.hashCode(
          array_join(slice(words, i + 1, lit(n)), " ")).cast(LongType)))
      .otherwise(emptyLongs)
    docs
      .select(col(idCol).as("doc_id"), shingleHashes.as("hs"))
      .select(col("doc_id"),
        explode(when(size(col("hs")) >= w,
          array_distinct(transform(sequence(lit(0), size(col("hs")) - w),
            j => array_min(slice(col("hs"), j + 1, lit(w))))))
          .otherwise(emptyLongs)).as("fp"))
  }

  /** Document pairs sharing at least `minShared` winnowed fingerprints —
    * candidate exact-substring duplicates with the shared-fingerprint
    * count as span evidence. The join is an inverted-index bucket join
    * keyed by fingerprint; fingerprints appearing in more than
    * `maxDocFreq` documents are dropped first (boilerplate n-grams — the
    * standard stop-fingerprint cap), which bounds any bucket's pair
    * fan-out by maxDocFreq² regardless of corpus size. */
  def sharedSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 6, w: Int = 4,
      minShared: Long = 2, maxDocFreq: Long = 100,
      fpPersist: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.NONE): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    require(maxDocFreq >= 2,
      s"maxDocFreq < 2 drops every cross-document fingerprint: $maxDocFreq")
    // the fingerprint relation feeds three consumers (the doc-frequency
    // cap + both join legs); `fpPersist` caches it once — same
    // default-off rationale as the dedup family's shinglePersist: a
    // library must not pin storage memory at 100 TB, while small/medium
    // callers win the repeated explode+window pipeline back
    val fps0 = winnowedFingerprints(docs, idCol, textCol, n, w)
    val fps =
      if (fpPersist == org.apache.spark.storage.StorageLevel.NONE) fps0
      else fps0.persist(fpPersist)
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq).select(col("fp"))
    val indexed = fps.join(rare, Seq("fp"))
    indexed.as("a")
      .join(indexed.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
  }

  /** Exact-substring near-duplicate candidates via winnowed fingerprints. */
  val q103SharedSpans: QueryDef = QueryDef("q103_shared_spans",
    s"""WITH words AS (
       |  SELECT doc_id,
       |    unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS i
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, i,
       |    w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
       |    lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' ' ||
       |    lead(w, 5) OVER win AS shingle
       |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
       |h AS (
       |  SELECT doc_id, i, ${TextAnalysis.duckJavaHash("shingle")} AS h
       |  FROM sh WHERE shingle IS NOT NULL),
       |fw AS (
       |  SELECT doc_id,
       |    min(h) OVER win4 AS fp, count(h) OVER win4 AS nf
       |  FROM h WINDOW win4 AS (
       |    PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
       |fps AS (SELECT DISTINCT doc_id, fp FROM fw WHERE nf = 4),
       |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 100),
       |indexed AS (SELECT doc_id, fp FROM fps JOIN rare USING (fp))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_fps
       |FROM indexed a JOIN indexed b
       |  ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    sharedSpans(Tables(spark, dir).documents,
      fpPersist = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .orderBy(col("id_a"), col("id_b"))
  }
}
