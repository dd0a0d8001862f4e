package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}
import graft.functions.GraftFunctions

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting (whitespace + BPE-ish regex),
  * language-ID (stopword n-gram heuristic), quality scoring
  * (length/stopword/uniqueness ratios) and document fingerprinting
  * (polynomial rolling hash, winnowing-style minimum shingle hash).
  *
  * All of it is pure column algebra over built-ins (+ the codegen'd
  * [[graft.functions.JavaHashCode]]) — no UDFs, no collect: each query is
  * one scan + one aggregation, embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  def defs: Seq[QueryDef] =
    Seq(q40TokenCount, q41LangQuality, q42Fingerprint, q116LmSurprisal)

  /** Token/char statistics for any (id, text) frame. */
  def tokenCounts(docs: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), " ", -1)).cast(LongType).as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast(LongType).as("n_bpe_tokens"),
      size(array_distinct(split(col(textCol), " ", -1))).cast(LongType).as("n_uniq_tokens"),
      length(col(textCol)).cast(LongType).as("n_chars"),
      length(regexp_replace(col(textCol), " ", "")).cast(LongType).as("n_nonspace_chars"))

  /** Whitespace tokens, BPE-ish regex tokens, distinct tokens, chars. */
  val q40TokenCount: QueryDef = QueryDef("q40_token_count",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
      |  length(text) AS n_chars,
      |  length(replace(text, ' ', '')) AS n_nonspace_chars
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    tokenCounts(Tables(spark, dir).documents).orderBy(col("doc_id"))
  }

  // tiny per-language marker lists for the n-gram language-ID heuristic
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "data", "fast"),
    "qy" -> Seq("query", "table", "scan"),
    "sp" -> Seq("spark", "stream", "batch"))

  // ONE interpreted filter pass per marker SET (higher-order-function
  // lambdas are interpreted per element — a per-marker pass would cost
  // |markers|x the lambda invocations for the same count)
  private def markerCount(words: Column, markers: Seq[String]): Column =
    size(filter(words, w => w.isin(markers: _*))).cast(LongType)

  /** Language-ID heuristic + quality scoring. The "languages" are marker
    * vocabularies (the fixture text is synthetic); the operator shape —
    * per-class marker counts, argmax with deterministic tie-break, ratio
    * features, weighted quality score — is the real pipeline pattern. */
  val q41LangQuality: QueryDef = QueryDef("q41_lang_quality",
    """WITH f AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS w, length(text) AS nc
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, lang, len(w) AS n_words,
      |    len(list_distinct(w)) AS n_uniq,
      |    CAST(len(list_filter(w, x -> x IN ('the', 'a', 'data', 'fast'))) AS BIGINT) AS c_en,
      |    CAST(len(list_filter(w, x -> x IN ('query', 'table', 'scan'))) AS BIGINT) AS c_qy,
      |    CAST(len(list_filter(w, x -> x IN ('spark', 'stream', 'batch'))) AS BIGINT) AS c_sp,
      |    CAST(len(list_filter(w, x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |    nc
      |  FROM f)
      |SELECT doc_id, lang, n_words,
      |  CASE WHEN c_en >= c_qy AND c_en >= c_sp THEN 'en'
      |       WHEN c_qy >= c_sp THEN 'qy' ELSE 'sp' END AS pred_lang,
      |  CAST(n_uniq AS DOUBLE) / n_words AS uniq_ratio,
      |  CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
      |  CAST(nc AS DOUBLE) / n_words AS avg_tok_len,
      |  0.5 * (CAST(n_uniq AS DOUBLE) / n_words)
      |    + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_words)
      |    + 0.2 * (CASE WHEN n_words BETWEEN 20 AND 90 THEN 1.0 ELSE 0.0 END) AS quality
      |FROM m ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val w = split(col("text"), " ", -1)
    val base = t.documents.select(
      col("doc_id"), col("lang"),
      size(w).cast(LongType).as("n_words"),
      size(array_distinct(w)).cast(LongType).as("n_uniq"),
      markerCount(w, langMarkers(0)._2).as("c_en"),
      markerCount(w, langMarkers(1)._2).as("c_qy"),
      markerCount(w, langMarkers(2)._2).as("c_sp"),
      markerCount(w, Seq("the", "a")).as("n_stop"),
      length(col("text")).cast(LongType).as("nc"))
    base.select(
      col("doc_id"), col("lang"), col("n_words"),
      when(col("c_en") >= col("c_qy") && col("c_en") >= col("c_sp"), "en")
        .when(col("c_qy") >= col("c_sp"), "qy").otherwise("sp").as("pred_lang"),
      (col("n_uniq").cast(DoubleType) / col("n_words")).as("uniq_ratio"),
      (col("n_stop").cast(DoubleType) / col("n_words")).as("stop_ratio"),
      (col("nc").cast(DoubleType) / col("n_words")).as("avg_tok_len"),
      (lit(0.5) * (col("n_uniq").cast(DoubleType) / col("n_words"))
        + lit(0.3) * (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_words"))
        + lit(0.2) * when(col("n_words").between(20, 90), 1.0).otherwise(0.0)).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Oracle-side replica of [[graft.functions.JavaHashCode]]: 31-poly hash
    * with int32 wraparound, written with DuckDB list_reduce. */
  def duckJavaHash(expr: String): String =
    s"""list_reduce(
       |    list_transform(range(1, length($expr)+1),
       |                   i -> CAST(unicode(substr($expr, CAST(i AS INT), 1)) AS BIGINT)),
       |    (a, c) -> ((((31*a + c + 2147483648) % 4294967296) + 4294967296) % 4294967296) - 2147483648)""".stripMargin

  /** Document fingerprinting: whole-text 31-poly hash plus a
    * winnowing-style fingerprint (minimum Java-hash over 5-gram word
    * shingles — robust to local edits, the standard near-dup sketch
    * primitive). */
  val q42Fingerprint: QueryDef = QueryDef("q42_fingerprint",
    s"""WITH words AS (
       |  SELECT doc_id,
       |    unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS i
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' ' ||
       |    lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win AS shingle
       |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY i))
       |SELECT d.doc_id,
       |  ${duckJavaHash("d.text")} AS text_hash,
       |  m.min_shingle_hash
       |FROM documents d
       |JOIN (SELECT doc_id, min(${duckJavaHash("shingle")}) AS min_shingle_hash
       |      FROM sh WHERE shingle IS NOT NULL GROUP BY doc_id) m
       |  ON d.doc_id = m.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val docs = t.documents
    // the shared shingle idiom (Dedup.shingles); its distinct() is
    // irrelevant under the min() aggregate below
    val minShingle = Dedup.shingles(docs, n = 5)
      .groupBy(col("doc_id"))
      .agg(min(GraftFunctions.hashCode(col("shingle")).cast(LongType)).as("min_shingle_hash"))
    docs.select(col("doc_id"),
        GraftFunctions.hashCode(col("text")).cast(LongType).as("text_hash"))
      .join(minShingle, "doc_id")
      .orderBy(col("doc_id"))
  }

  /** CCNet-style language-model quality scoring: per-document surprisal
    * of a bigram stupid-backoff LM built from a reference corpus — the
    * canonical "keep documents a reference LM finds unsurprising"
    * pretraining filter (a KenLM stand-in with the same pipeline shape).
    *
    * Model: p(w_1) = U(w_1)/T; p(w_i | w_{i-1}) = B/U(w_{i-1}) when the
    * bigram was seen, else 0.4·U(w_i)/T, else 0.4/T for OOV (stupid
    * backoff — no discounting, the standard web-scale shortcut).
    *
    * Engine-order determinism: ln(p) values are irrational, and a
    * floating SUM over them would depend on partial-aggregation order.
    * Each token's surprisal is floored to integer MICRO-NATS first
    * (floor(-ln(p)·1e6) — identical bits → identical floor on both
    * engines), so the per-doc sum is exact 64-bit integer arithmetic,
    * associative under any partitioning. ~1e-9/token chance an engine
    * ulp difference in ln lands inside the floor boundary; precision
    * 1e-6 nats/token is far below any filtering threshold's needs.
    *
    * Scale shape: the LM tables are plain DataFrames keyed by
    * xxhash64(token) — 8-byte join keys, never strings on the shuffle
    * (the q78 lesson); T is the LM build's one driver-side scalar
    * statistic (like the IVF centroids). Scoring is three left
    * hash-joins + one integer aggregation, no collect, no UDF. In
    * production the LM build runs once and `uni`/`bi` persist; pass
    * them back via `lm` to skip the rebuild. */
  def lmSurprisal(batch: org.apache.spark.sql.DataFrame,
      lmCorpus: org.apache.spark.sql.DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col(idCol).as("doc_id"),
          posexplode(split(col(textCol), " ", -1)).as(Seq("i", "w")))
        .withColumn("wh", xxhash64(col("w")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val lmTok = toks(lmCorpus)
    val tTotal = lmTok.count()
    val t = lit(tTotal).cast(DoubleType)
    val uni = lmTok.groupBy(col("wh")).agg(count(lit(1)).as("u"))
    val bi = lmTok.withColumn("nwh", lead(col("wh"), 1).over(w))
      .filter(col("nwh").isNotNull)
      .groupBy(col("wh"), col("nwh")).agg(count(lit(1)).as("b"))
    val bt = toks(batch).withColumn("pwh", lag(col("wh"), 1).over(w))
    val p = when(col("pwh").isNull,
        when(col("uw").isNotNull, col("uw").cast(DoubleType) / t)
          .otherwise(lit(0.4) / t))
      .otherwise(when(col("b").isNotNull,
          col("b").cast(DoubleType) / col("upw").cast(DoubleType))
        .otherwise(when(col("uw").isNotNull,
            lit(0.4) * (col("uw").cast(DoubleType) / t))
          .otherwise(lit(0.4) / t)))
    bt.join(uni.select(col("wh"), col("u").as("uw")), Seq("wh"), "left")
      .join(uni.select(col("wh").as("pwh"), col("u").as("upw")),
        Seq("pwh"), "left")
      .join(bi.select(col("wh").as("pwh"), col("nwh").as("wh"), col("b")),
        Seq("pwh", "wh"), "left")
      .withColumn("m", floor((lit(0.0) - log(p)) * 1000000.0).cast(LongType))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("m")).as("nll_micro"))
      .select(col("doc_id"), col("n_tok"), col("nll_micro"),
        expr("nll_micro div n_tok").as("avg_nll_micro"))
  }

  /** LM surprisal over the fixture split: the corpus slice
    * (doc_id % 3 <> 0) trains the bigram LM, the batch slice
    * (doc_id % 3 = 0) is scored — the q114/q115 incremental split. The
    * oracle restates the model in SQL; both sides floor per-token
    * micro-nats before summing, so the compare is integer-exact. */
  val q116LmSurprisal: QueryDef = QueryDef("q116_lm_surprisal",
    """WITH lm_tok AS (
      |  SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS w,
      |    generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents WHERE doc_id % 3 <> 0),
      |tot AS (SELECT count(*) AS t FROM lm_tok),
      |uni AS (SELECT w, count(*) AS u FROM lm_tok GROUP BY w),
      |bi0 AS (
      |  SELECT w, lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS nw
      |  FROM lm_tok),
      |bi AS (SELECT w, nw, count(*) AS b FROM bi0
      |       WHERE nw IS NOT NULL GROUP BY w, nw),
      |bt0 AS (
      |  SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS w,
      |    generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents WHERE doc_id % 3 = 0),
      |bt AS (
      |  SELECT doc_id, i, w,
      |    lag(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS pw
      |  FROM bt0),
      |scored AS (
      |  SELECT bt.doc_id,
      |    CASE
      |      WHEN bt.pw IS NULL THEN
      |        CASE WHEN uw.u IS NOT NULL
      |             THEN CAST(uw.u AS DOUBLE) / CAST(t AS DOUBLE)
      |             ELSE CAST(0.4 AS DOUBLE) / CAST(t AS DOUBLE) END
      |      WHEN bi.b IS NOT NULL THEN
      |        CAST(bi.b AS DOUBLE) / CAST(up.u AS DOUBLE)
      |      ELSE
      |        CASE WHEN uw.u IS NOT NULL
      |             THEN CAST(0.4 AS DOUBLE)
      |                  * (CAST(uw.u AS DOUBLE) / CAST(t AS DOUBLE))
      |             ELSE CAST(0.4 AS DOUBLE) / CAST(t AS DOUBLE) END
      |    END AS p
      |  FROM bt
      |  CROSS JOIN tot
      |  LEFT JOIN uni uw ON uw.w = bt.w
      |  LEFT JOIN uni up ON up.w = bt.pw
      |  LEFT JOIN bi ON bi.w = bt.pw AND bi.nw = bt.w)
      |SELECT doc_id, count(*) AS n_tok,
      |  CAST(sum(CAST(floor((0 - ln(p)) * 1000000.0) AS BIGINT)) AS BIGINT)
      |    AS nll_micro,
      |  CAST(sum(CAST(floor((0 - ln(p)) * 1000000.0) AS BIGINT)) AS BIGINT)
      |    // count(*) AS avg_nll_micro
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) {
    (spark, dir) =>
      val docs = Tables(spark, dir).documents
      lmSurprisal(docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0))
        .orderBy(col("doc_id"))
  }
}
