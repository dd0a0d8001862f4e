package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}
import graft.functions.GraftFunctions

/** Deduplication operators for a training-data pipeline (SURVEY.md §2.9
  * deduplicate + the LLM-pipeline extensions): exact (hash groupBy),
  * keep-first row dedup (reference DeduplicateKeepFirstRowFunction.java:34
  * re-expressed as rank-1 — Catalyst pushes it into WindowGroupLimit),
  * n-gram Jaccard (shingle equi-join), MinHash+LSH (shingle → 96-hash
  * signature → 32 bands → bucket join → exact verify) and SimHash
  * (32-bit, shingle features, hamming-ball pairs).
  *
  * Scale design: everything is shuffle-on-key column algebra. The LSH path
  * is the 100 TB plan — candidates come from equal band-hash buckets
  * (O(n·bands) shuffle), never from an O(n²) cross join; the exact-Jaccard
  * verification join runs only on the candidate set.
  */
object Dedup {

  def defs: Seq[QueryDef] = Seq(
    q43DedupKeepFirst, q44DedupExact, q45NgramJaccard, q46MinHashLsh,
    q47SimHash, q48SimHashPairs, q49DupClusters, q114IncrementalDedup,
    q118RepeatedSpans)

  /** Keep-first-row dedup on a key, ordered by event time: the batch
    * equivalent of the reference's streaming DeduplicateKeepFirstRowFunction
    * (`ROW_NUMBER()=1` pattern, StreamExecDeduplicateRule). */
  val q43DedupKeepFirst: QueryDef = QueryDef("q43_dedup_keep_first",
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Exact dedup via content-hash groupBy: canonical (minimum) doc id and
    * multiplicity per distinct normalized text. */
  val q44DedupExact: QueryDef = QueryDef("q44_dedup_exact",
    """SELECT md5(lower(text)) AS content_hash,
      |  min(doc_id) AS canonical_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(lower(text))
      |ORDER BY canonical_id""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.documents
      .groupBy(md5(lower(col("text"))).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))
  }

  /** Distinct n-gram word shingles per document, normalized to columns
    * (doc_id, shingle) whatever the input column names (posexplode + lead
    * window; measured faster than the narrow array-transform alternative —
    * the higher-order-function lambda is interpreted per element and costs
    * more than the window's shuffle+sort at every tested scale). */
  def shingles(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame =
    rawShingles(docs, idCol, textCol, n).distinct()

  /** [[shingles]] before its distinct — consumers that aggregate per doc
    * anyway (collect_set) dedup inside their own aggregation and skip the
    * distinct's exchange. */
  private def rawShingles(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ", -1)).as(Seq("i", "w")))
      .withColumn("shingle",
        concat_ws(" ", (0 until n).map(k => lead(col("w"), k).over(w)): _*))
      .filter(size(split(col("shingle"), " ", -1)) === n)
      .select(col("doc_id"), col("shingle"))
  }

  /** Per-doc SORTED distinct shingle-hash sets: (doc_id, shset, n),
    * MAP-ONLY — the [[graft.functions.ShingleHashSet]] kernel hashes each
    * n-word window in place over the text bytes, so there is no explode
    * fan-out, no per-doc window sort exchange and no distinct shuffle
    * (r16 optimization, guide §2.4: the LSH family used to run the
    * scan+explode+window pipeline once for its signature aggregate and
    * AGAIN for the verify sets — both now derive from this one relation,
    * signatures via the [[graft.functions.MinHashSig96]] per-row kernel). */
  private def docHashSets(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.GraftFunctions
          .shingleHashSet(col(textCol), n).as("shset"))
      // docs with no n-gram (short/empty/null text) never appeared in the
      // old aggregation and must not appear here (an empty set would
      // bucket-match every other empty set)
      .filter(size(col("shset")) >= 1)
      .withColumn("n", size(col("shset")).cast(LongType))

  /** n-gram Jaccard near-dup pairs ≥ threshold, exact (shingle equi-join,
    * no cross join). The hashed shingle relation feeds three consumers
    * (both join legs + the per-doc counts); `shinglePersist` caches it
    * once — same default-off rationale as [[minHashLshPairs]]: at 100 TB
    * the shingle expansion does not fit in storage memory and a library
    * must not pin blocks, while small/medium callers win two scans. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, threshold: Double = 0.6,
      shinglePersist: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.NONE): DataFrame =
    jaccardPairs(hashedShingles(docs, idCol, textCol, n), threshold, None,
      shinglePersist)

  /** MinHash + banded-LSH near-dup pairs ≥ threshold with exact-Jaccard
    * verification on the candidate set. The signature is fixed at
    * [[NumHashes]] (96) hashes — the one-pass aggregator's permutation
    * bank is compiled in — so the tunable is `bands`, which must divide
    * 96 (rows per band = 96 / bands). */
  def minHashLshPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, threshold: Double = 0.6,
      bands: Int = Bands,
      shinglePersist: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.NONE): DataFrame = {
    // One per-doc hash-set relation feeds BOTH the signature path (via the
    // per-row MinHashBands96 kernel) and the exact verify join — pre-r16
    // the two paths each re-ran the scan+explode+window shingle pipeline.
    // By default the sets relation is NOT cached: the map-only relation
    // has no exchange to reuse, so its four consumers (two banded legs,
    // two verify legs) each rescan+rehash the corpus text — measured
    // CHEAPER than caching at sf0.1 (the r16 sets cache was 2.7x slower),
    // and a library entry point that leaves blocks pinned in a
    // long-lived session leaks.
    // Small/medium-scale callers can opt in via shinglePersist (e.g.
    // MEMORY_AND_DISK) — the cached relation is one ~1.6 KB row per doc,
    // severalfold smaller than the shingle stream the pre-r16 code cached.
    require(bands >= 1 && bands <= NumHashes && NumHashes % bands == 0,
      s"bands must divide the $NumHashes-hash signature, got $bands")
    val sets0 = docHashSets(docs, idCol, textCol, n)
    val sets =
      if (shinglePersist == org.apache.spark.storage.StorageLevel.NONE) sets0
      else sets0.persist(shinglePersist)
    val banded = bandedFromSets(sets, NumHashes, bands)
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("bhs").as("ba"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("bhs").as("bb"))
    val cands = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("band") === firstEqualBand)
      .select(col("id_a"), col("id_b"))
    // same broadcast cap as jaccardPairs' verify; the doc count is read
    // from the raw docs relation (an upper bound on docs with >= 1
    // shingle — conservative, and far cheaper than re-counting the
    // aggregated sets)
    val nDocs = docs.limit(BroadcastSetsMaxDocs + 1).count()
    verifySets(cands, sets, sets, threshold,
        broadcastSets = nDocs <= BroadcastSetsMaxDocs)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** DuckDB CTEs producing the same distinct-3-gram-shingle relation. */
  private val duckShingleCte: String =
    """words AS (
      |  SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS w,
      |    generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  /** Exact pairwise Jaccard ≥ threshold over a (doc_id, shingle) relation.
    *
    * Both paths compare shingles through their `xxhash64` values, never the
    * strings: 3-gram strings average ~20 bytes where the hash is a flat 8,
    * so hashing cuts every shuffle this operator pays severalfold and
    * bounds row width on long documents. Per-doc counts still come from
    * the distinct STRING shingles, so the Jaccard denominators are exact;
    * hash equality standing in for string equality in the intersection is
    * exact up to 64-bit collisions (P ≈ |shingles|²·2⁻⁶⁴ — negligible
    * against the corpus sizes this library targets).
    *
    * Brute force (no candidates): shingle-hash equi-join — never a cross
    * join, and the join key is a primitive long. LSH path (candidates
    * given): the equi-join would still be paid in full before any
    * restriction, so instead each candidate pair joins the per-doc hashed
    * shingle sets (collected once, `Array[Long]`) and intersects them in
    * place — cost proportional to |candidates|, not shingle co-occurrence. */
  private def jaccardPairs(hashed0: DataFrame, threshold: Double,
      candidates: Option[DataFrame],
      hashedPersist: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.NONE): DataFrame = {
    // hashed0: the distinct (doc_id, h) shingle-hash relation (map-only
    // via the ShingleHashSet kernel). When a persist level is given,
    // cache it — 8-byte keys, severalfold smaller than string shingles.
    val hashed =
      if (hashedPersist == org.apache.spark.storage.StorageLevel.NONE) hashed0
      else hashed0.persist(hashedPersist)
    // Exact per-pair verification shared by the LSH and prefix-filter
    // candidate paths (r15): each doc's distinct hash set is SORTED once
    // (sort_array at aggregation), the sets relation joins the candidate
    // pairs BROADCAST when the corpus is small enough (id -> ~1.6 KB of
    // hashes; shipping arrays per-pair through a shuffle was measured at
    // ~90 GB on 29M sf1 candidates), and the intersection count is the
    // primitive sorted-merge kernel [[graft.functions.SortedIntersectSize]]
    // — no per-pair hash set, fused into codegen.
    def verify(c: DataFrame): DataFrame = {
      val sets = hashed.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("h"))).as("shset"),
          count(lit(1)).as("n"))
      val nDocs = hashed.select(col("doc_id")).distinct()
        .limit(BroadcastSetsMaxDocs + 1).count()
      verifySets(c, sets, sets, threshold,
          broadcastSets = nDocs <= BroadcastSetsMaxDocs)
        .orderBy(col("id_a"), col("id_b"))
    }
    candidates match {
      case Some(c) => verify(c)
      case None =>
        // EXACT path via PREFIX FILTERING (r15; Chaudhuri et al. ICDE'06 /
        // Xiao et al. PPJoin): the naive shingle equi-join generates
        // sum(c_h^2) candidates, and on a saturating vocabulary c_h grows
        // with the corpus — measured QUADRATIC on the fixtures (docs x10
        // -> candidates x90, scale/q45_candidate_audit.jsonl). Under a
        // global shingle order (rarest doc-frequency first, hash
        // tie-break), two sets with Jaccard >= t MUST share a shingle
        // inside each one's first (n - ceil(t*n) + 1) shingles — so
        // candidates come from a prefix-only equi-join whose per-shingle
        // fanout is bounded by rarity, and each candidate pair is then
        // verified EXACTLY on the full hash sets. Same answer; measured
        // candidate reduction 78x at sf0.01 / 4.2x at sf0.1 (the fixture
        // corpus is template-generated and unusually self-similar — on a
        // real web corpus rare-prefix fanout is far smaller; the residual
        // candidates here are dominated by TRUE near-dup pairs no exact
        // algorithm can skip).
        verify(prefixCandidates(hashed, threshold))
    }
  }

  /** Exact-Jaccard verification of candidate pairs against per-doc
    * (doc_id, shset, n) relations: each pair joins its two sorted hash
    * sets (BROADCAST under the caller's cap — id → ~1.6 KB of hashes;
    * shipping arrays per-pair through a shuffle was measured at ~90 GB on
    * 29M sf1 candidates) and counts the intersection with the codegen
    * [[graft.functions.SortedIntersectSize]] merge kernel. */
  private def verifySets(c: DataFrame, setsA: DataFrame, setsB: DataFrame,
      threshold: Double, broadcastSets: Boolean,
      aId: String = "id_a", bId: String = "id_b"): DataFrame = {
    val jaccard = (i: Column, na: Column, nb: Column) =>
      i.cast(DoubleType) / (na + nb - i)
    val sa = setsA.select(col("doc_id").as(aId), col("shset").as("sa"),
      col("n").as("na"))
    val sb = setsB.select(col("doc_id").as(bId), col("shset").as("sb"),
      col("n").as("nb"))
    val (ja, jb) = if (broadcastSets) (broadcast(sa), broadcast(sb)) else (sa, sb)
    c.join(ja, Seq(aId)).join(jb, Seq(bId))
      .select(col(aId), col(bId),
        jaccard(graft.functions.GraftFunctions
            .sortedIntersectSize(col("sa"), col("sb")),
          col("na"), col("nb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Prefix-filtered candidate pairs over the hashed shingle relation
    * (the exact-Jaccard candidate generator). r16 adds the PPJoin SIZE
    * and POSITIONAL filters (Xiao et al. §3.2) on top of the r15 prefix
    * join — the r15 sf3 audit left the residual candidate growth
    * unadjudicated (VERDICT r15 #2), and splitting it requires the
    * before/after sets this entry exposes (`positional = false`
    * reproduces the r15 candidate set for `JaccardCandAudit`).
    *
    *  - Size filter: J(a,b) >= t forces t·|b| <= |a| <= |b|/t.
    *  - Positional filter: under the global (df, h) token order every
    *    shared token is either a prefix-prefix hit (m of them, counted
    *    by the groupBy) or GREATER than the last hit — so it sits past
    *    position pam in a and pbm in b, bounding the total overlap by
    *    m + min(na − pam, nb − pbm); a true pair needs overlap
    *    >= t/(1+t)·(na+nb).
    *
    * Both filters are SOUND (they only discard pairs no exact verify
    * could pass — the 1e-9 slack keeps a boundary pair when a double
    * product rounds a hair above its exact value), so the answer is
    * unchanged; only the verify join shrinks. The groupBy replaces the
    * r15 distinct(): same shuffle, strictly fewer rows out. */
  private[graft] def prefixCandidates(hashed: DataFrame, threshold: Double,
      positional: Boolean = true): DataFrame = {
    val cnt = hashed.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val freq = hashed.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val pref = hashed.join(freq, Seq("h"))
      .withColumn("pos", row_number().over(w))
      .join(cnt, Seq("doc_id"))
      .filter(col("pos") <=
        col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("doc_id"), col("h"), col("pos"), col("n"))
    val hitsA = pref.select(col("doc_id").as("id_a"), col("h"),
      col("pos").as("pa"), col("n").as("na"))
    val hitsB = pref.select(col("doc_id").as("id_b"), col("h"),
      col("pos").as("pb"), col("n").as("nb"))
    val hits = hitsA.join(hitsB, Seq("h")).filter(col("id_a") < col("id_b"))
    if (!positional)
      hits.select(col("id_a"), col("id_b")).distinct()
    else hits
      .filter(col("na") >= lit(threshold) * col("nb") - lit(1e-9) &&
        col("nb") >= lit(threshold) * col("na") - lit(1e-9))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("m"), max(col("pa")).as("pam"),
        max(col("pb")).as("pbm"), first(col("na")).as("na"),
        first(col("nb")).as("nb"))
      .filter(col("m") +
        least(col("na") - col("pam"), col("nb") - col("pbm")) >=
        lit(threshold) / (lit(1.0) + lit(threshold)) *
          (col("na") + col("nb")) - lit(1e-9))
      .select(col("id_a"), col("id_b"))
  }

  /** The distinct hashed (doc_id, h) shingle relation the exact path
    * runs on — map-only via the [[graft.functions.ShingleHashSet]]
    * kernel (no explode/window/distinct shuffle). Exposed for
    * `JaccardCandAudit` so the audit counts the kernel's own relations,
    * not a reimplementation. */
  private[graft] def hashedShingles(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.GraftFunctions
        .shingleHashSet(col(textCol), n)).as("h"))

  private val duckJaccardSql: String =
    s"""WITH $duckShingleCte,
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = id_a
       |JOIN cnt cb ON cb.doc_id = id_b
       |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.6
       |ORDER BY id_a, id_b""".stripMargin

  /** n-gram Jaccard near-dup pairs, exact (shingle equi-join). */
  val q45NgramJaccard: QueryDef = QueryDef("q45_ngram_jaccard", duckJaccardSql) {
    // the fixture corpus is single-node-sized, so the query opts into the
    // hashed-shingle cache (four consumers, one computation; measured
    // neutral-to-better than NONE at sf0.1, unlike the LSH path where the
    // r16 sets cache was measured 2.7x slower and removed)
    (spark, dir) => ngramJaccardPairs(Tables(spark, dir).documents,
      shinglePersist = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private val NumHashes = 96
  private val Bands = 32 // 3 rows per band; P[miss | J=0.9] ≈ 3e-18

  /** Docs at or under this broadcast the sorted hash-set relation into
    * the exact-Jaccard verify join (~1.6 KB/doc of hashes → ≤ 800 MB);
    * past it the sets relation shuffles like any other join side. */
  val BroadcastSetsMaxDocs: Int = 500000

  /** Whole-signature MinHash aggregator: one pass over the shingle hashes,
    * a primitive 96-slot min array as the buffer (kept deserialized by
    * ObjectHashAggregate; serialized only at the shuffle boundary). The
    * alternative — 96 separate `min()` aggregate columns — pays the
    * per-column aggregation machinery 96× per input row and measured ~10×
    * slower. Permutations are linear maps mod 2^31-1 over one xxhash64
    * (operands < 2^62, so no ANSI overflow). */
  object MinHashSig extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Seq[Long]] {
    private val P = 2147483647L // 2^31 - 1
    private val A = Array.tabulate(NumHashes)(i => (1234567L * (i + 1)) % P)
    private val B = Array.tabulate(NumHashes)(i => (987654321L * i) % P)
    def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val hp = (h % P + P) % P
      var i = 0
      while (i < NumHashes) {
        val v = (hp * A(i) + B(i)) % P
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumHashes) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    // ExpressionEncoder writes the buffer as an UnsafeArrayData of longs —
    // a flat 8-byte-per-slot copy at every partial-agg/shuffle boundary.
    // (The earlier javaSerialization encoder paid ObjectOutputStream per
    // buffer crossing, measured ~15% of q46's runtime.)
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** MinHash + banded LSH near-dup pairs with exact-Jaccard verification.
    * Produces the same answer as [[q45NgramJaccard]] (the oracle) with
    * near-certain recall, but scales as O(n·bands) instead of relying on
    * shingle-join fan-out: signature = 96 independent min-hashes, 32 bands
    * of 3, candidates = pairs sharing a band bucket. */
  val q46MinHashLsh: QueryDef = QueryDef("q46_minhash_lsh", duckJaccardSql) {
    (spark, dir) => minHashLshPairs(Tables(spark, dir).documents)
  }

  /** One row per (doc, band) derived from the per-doc hash-set relation:
    * the doc's full 32-slot band-hash vector plus that band's
    * (band, bucket) join key — the exploded relation the self-join and
    * the cross-corpus candidate joins bucket on. Signatures come from the
    * per-row [[graft.functions.MinHashSig96]] kernel over the set array
    * (numerically identical to the [[MinHashSig]] aggregator), so the
    * candidate buckets are unchanged while the shingle stream is
    * aggregated exactly once.
    *
    * On pair dedup: a pair sharing k band buckets surfaces k times out
    * of the bucket join (near-dups share most of their 32 bands);
    * instead of a `distinct()` — a full extra shuffle of the duplicated
    * pair stream, and map-side dedup cannot collapse the copies because
    * they leave from DIFFERENT (band, bucket) partitions — each side
    * carries its band-hash vector through the join and a pair is kept
    * only where the joined band is the FIRST position at which the two
    * vectors agree (the q48 pigeonhole trick): pure per-row arithmetic,
    * each pair emitted exactly once, no second shuffle. */
  private def bandedFromSets(sets: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes == NumHashes,
      s"the per-row signature kernel is compiled for $NumHashes hashes")
    // One MinHashBands96 kernel call per row (signature + all band
    // buckets in a single pass over the hash set). The r16 column
    // construction — array(xxhash64(lit(b), element_at(sig, ...)...))
    // over a minHashSig96 projection — was collapsed by CollapseProject
    // and the generator's inferred size()>0 filter into 96 inlined
    // element_at(minhash_sig96(shingle_hash_set(text))) copies, i.e. ~96
    // full signature recomputations per row pushed into the scan filter
    // (plans/r17/q46_minhash_lsh_before.txt node (2); q46 19.8 s at
    // 32c). The kernel is bit-identical to the column form
    // (FnKernelsPropertySpec "minHashBands96").
    sets
      .withColumn("bhs",
        graft.functions.GraftFunctions.minHashBands96(col("shset"), bands))
      .select(col("doc_id"), col("bhs"),
        posexplode(col("bhs")).as(Seq("band", "bucket")))
  }

  // array_position is 1-based; posexplode's band is 0-based
  private def firstEqualBand: Column =
    array_position(zip_with(col("ba"), col("bb"), (x, y) => x === y), lit(true)) - 1

  /** DuckDB replica of the 32-bit shingle-feature SimHash (bit-majority
    * over JavaHashCode'd features; >> is arithmetic in both engines so the
    * sign bit works out identically). */
  private val duckSimhashSql: String = {
    val votes = (0 until 32)
      .map(b => s"SUM(CASE WHEN (wh >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    val assemble = (0 until 32)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""$duckShingleCte,
       |hashed AS (
       |  SELECT doc_id, ${TextAnalysis.duckJavaHash("shingle")} AS wh FROM sh),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM votes)""".stripMargin
  }

  /** 32-bit shingle-feature SimHash fingerprints per document. */
  def simhashFingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
      .withColumn("wh", GraftFunctions.hashCode(col("shingle")))
    val votes = (0 until 32).map(b =>
      sum(when(shiftright(col("wh"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
    val assemble = (0 until 32)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce[Column](_ + _)
    sh.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), assemble.cast(LongType).as("simhash"))
  }

  /** SimHash fingerprint per document. */
  val q47SimHash: QueryDef = QueryDef("q47_simhash",
    s"""WITH $duckSimhashSql
       |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin) {
    (spark, dir) => simhashFingerprints(Tables(spark, dir).documents).orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs within a hamming radius, chunk-blocked
    * (Manku/Jain/Sarma's pigeonhole blocking, WWW'07): the 32-bit
    * fingerprint splits into `radius + 1` chunks, and two fingerprints
    * within the radius must agree on ≥ 1 chunk at the same position — so
    * candidates come from an equi-join on (chunk index, chunk value) and
    * the exact popcount runs only on candidates. Produces the identical
    * exact answer to the all-pairs comparison with no cartesian product;
    * candidate volume is the per-bucket collision mass, which at uniform
    * fingerprint spread is n²·(k/2^(32/k)) ≪ n² and shrinks further with a
    * wider fingerprint. */
  def simhashPairs(fp: DataFrame, radius: Int = 5): DataFrame = {
    // radius+1 chunks must each carry >= 1 of the 32 fingerprint bits
    require(radius >= 0 && radius < 32,
      s"simhash radius must be in [0, 32), got $radius")
    val chunks = radius + 1
    val bitsPer = 32 / chunks // remainder bits join the last chunk
    def chunkOf(c: Column, i: Int): Column = {
      val width = if (i == chunks - 1) 32 - bitsPer * i else bitsPer
      shiftrightunsigned(c, bitsPer * i).bitwiseAND((1L << width) - 1)
    }
    val banded = fp.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until chunks).map(chunkOf(col("simhash"), _)): _*))
        .as(Seq("ci", "cv")))
    val l = banded.select(col("ci"), col("cv"), col("doc_id").as("id_a"), col("simhash").as("ha"))
    val r = banded.select(col("ci"), col("cv"), col("doc_id").as("id_b"), col("simhash").as("hb"))
    // a pair sharing k chunks surfaces k times; instead of a distinct()
    // shuffle, keep it only where ci is the FIRST equal chunk — pure
    // codegen'd per-row arithmetic, each pair emitted exactly once
    val firstEqual = (0 until chunks).foldRight(lit(-1)) { (i, rest) =>
      when(chunkOf(col("ha"), i) === chunkOf(col("hb"), i), lit(i)).otherwise(rest)
    }
    l.join(r, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("ci") === firstEqual)
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast(LongType).as("dist"))
      .filter(col("dist") <= radius)
  }

  /** SimHash near-dup pairs: hamming distance ≤ 5 (the planted near-dup
    * pairs sit at ≤ 5 on this corpus; background mass starts at 6),
    * via [[simhashPairs]] chunk-blocking — the oracle is the all-pairs
    * formulation, the engine never builds a cross join (plan-asserted in
    * ScaleSpec). */
  val q48SimHashPairs: QueryDef = QueryDef("q48_simhash_pairs",
    s"""WITH $duckSimhashSql
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5
       |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    simhashPairs(simhashFingerprints(Tables(spark, dir).documents))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Duplicate CLUSTERS from near-dup pairs: connected components, the
    * step every corpus dedup needs between pairwise similarity and "keep
    * one representative per group" (transitively: if a~b and b~c, then
    * {a,b,c} dedup together even when a~c itself is below threshold).
    *
    * Distributed iterative min-label propagation: every node repeatedly
    * adopts the smallest label in its closed neighborhood; converges in
    * O(max component diameter) rounds, each round one equi-join + one
    * aggregate — all shuffle-on-key, nothing driver-sized. Near-dup
    * components are short-diameter chains/cliques, so rounds stay single
    * digits; a pathological long-chain graph takes the
    * large-star/small-star variant [[dupClustersStar]] (r14), which swaps
    * neighbor-min for star-contraction in the same join algebra and
    * converges in O(log n) rounds. Intermediates persist per round and unpersist as
    * soon as superseded; the result is local-checkpointed so the returned
    * frame reads materialized blocks instead of an N-round lineage.
    *
    * Returns (node, cluster) — `cluster` is the component's minimum node
    * id; nodes in no pair are absent (they dedup to themselves). */
  def dupClusters(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxRounds: Int = 64): DataFrame = {
    val half = pairs.select(col(aCol).cast(LongType).as("src"),
      col(bCol).cast(LongType).as("dst"))
    // pre-partitioned on the per-round join key: the cached blocks carry
    // hash(dst) partitioning, so each round's edge-label join shuffles
    // only the (node, cluster) label relation, never the edge set
    val edges = half.union(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().repartition(col("dst")).persist()
    // the first propagation round is fused into the seed: with identity
    // labels the neighbor-min join degenerates to min(dst) per src
    // (every node appears as src — edges are symmetrized), so the seed
    // aggregate IS round one, without paying an edges⋈labels join for it
    var cached = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("src").as("node"),
        least(col("src"), col("nmin")).as("cluster"))
      .persist()
    var labels = cached
    var changed = true
    var rounds = 0
    // unpersist on EVERY exit: the non-convergence throw below would
    // otherwise leak the pinned edge relation and the last round frame
    // into the session the caller is advised to retry in
    try {
      while (changed) {
        rounds += 1
        require(rounds <= maxRounds,
          s"connected components did not converge in $maxRounds rounds — " +
            "component diameter exceeds the bound; raise maxRounds or use a " +
            "star-contraction variant for long-chain graphs")
        val neighborMin = edges
          .join(labels.select(col("node").as("dst"), col("cluster")), Seq("dst"))
          .groupBy(col("src").as("node")).agg(min(col("cluster")).as("nmin"))
        // the previous label rides along in the persisted round frame, so
        // convergence is a filter over cached blocks, not another join.
        // localCheckpoint (eager) rather than persist: `labels` feeds two
        // places in each round's plan, so lineage would DOUBLE per round
        // — a caching-only iteration re-optimizes an exponentially
        // growing logical plan and OOMs the driver near round ~15 (r14);
        // checkpointing truncates the plan to the materialized blocks
        val next = labels.join(neighborMin, Seq("node"), "left")
          .select(col("node"), col("cluster").as("prev"),
            least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
          .localCheckpoint(true)
        changed = !next.filter(col("cluster") =!= col("prev")).isEmpty
        cached.unpersist()
        cached = next
        labels = next.select(col("node"), col("cluster"))
      }
      labels.localCheckpoint(true)
    } finally {
      cached.unpersist()
      edges.unpersist()
    }
  }

  /** Connected components by ALTERNATING STAR CONTRACTION — the
    * large-star/small-star algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014): O(log n) rounds on
    * ANY graph shape, where [[dupClusters]]' min-label propagation pays
    * O(component diameter) rounds. Same contract, same oracle: returns
    * (node, cluster) with cluster = the component's minimum node id;
    * nodes in no pair are absent.
    *
    * One round = two phases over the oriented edge set (src > dst),
    * each an aggregate + equi-join, all shuffle-on-key:
    *
    *  - LARGE-STAR: every node u connects its strictly LARGER neighbors
    *    to min(N(u) ∪ {u}) — each edge re-emits exactly once, from its
    *    smaller endpoint's neighborhood;
    *  - SMALL-STAR: every node u connects its smaller-or-equal
    *    neighbors AND ITSELF to its minimum neighbor.
    *
    * Both preserve connectivity; alternating them strictly contracts
    * chains, and at convergence (stable edge set — both frames are
    * distinct, so stability is one anti-join + a count) every component
    * is a star around its minimum node, which IS the label relation.
    * Long skewed chains that would exhaust the propagation bound
    * converge here in a handful of rounds (`ApiSpec` pins a
    * 512-node chain at ≤ 12 rounds). */
  def dupClustersStar(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxRounds: Int = 32): DataFrame =
    dupClustersStarCounted(pairs, aCol, bCol, maxRounds)._1

  /** [[dupClustersStar]] + the round count, for the convergence spec. */
  private[operators] def dupClustersStarCounted(pairs: DataFrame,
      aCol: String, bCol: String, maxRounds: Int): (DataFrame, Int) = {
    // each round's frame is localCheckpoint'ed (eager), not persisted:
    // the edge relation feeds ~4 places per phase, so lineage would grow
    // exponentially across rounds — checkpointing truncates the plan to
    // the materialized blocks (freed by the context cleaner as the old
    // frames go out of scope), keeping round r's optimizer input O(1)
    var edges = pairs
      .select(col(aCol).cast(LongType).as("a"), col(bCol).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct().localCheckpoint(true)
    // One aggregate job yields the round's count AND an order-invariant
    // set fingerprint (bit_xor of per-edge xxhash64 — overflow-free under
    // ANSI). Equal sets imply equal (count, fp); the convergence
    // candidate is confirmed by the EXACT exceptAll below, so a
    // fingerprint collision can only cost one wasted confirmation, never
    // a wrong answer. This replaces the r15 protocol's two count() jobs +
    // eager exceptAll per round (q49's wall time at bench scale was
    // dominated by per-round action count, not data).
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("src"), col("dst")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var edgesFp = fingerprint(edges)
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      require(rounds <= maxRounds,
        s"star contraction did not converge in $maxRounds rounds — " +
          "not expected on any finite graph (O(log n) bound); raise " +
          "maxRounds if the component count is astronomically large")
      // large-star: for every u, m(u) = min(N(u) ∪ {u}); emit
      // (v, m(u)) for v ∈ N(u), v > u. Orientation (big, small) is
      // preserved: m(u) <= u < v. The per-u minimum is a whole-partition
      // window MIN (r16 opt): the former groupBy + equi-join back paid
      // TWO exchanges of the neighbor relation per phase where the
      // window pays one exchange + an in-partition sort — measured
      // faster at every tested scale on the checkpoint-per-round loop,
      // and identical row-for-row (same min attached to every (src,
      // dst)).
      val uw = Window.partitionBy(col("src"))
      val nbrs = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val ls = nbrs
        .withColumn("m", least(col("src"), min(col("dst")).over(uw)))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
      // small-star: per u (src of the oriented edges), m = min
      // neighbor; emit (v, m) for its smaller neighbors plus (u, m)
      val withM = ls.withColumn("m", min(col("dst")).over(uw))
      val next = withM
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .union(withM.select(col("src"), col("m").as("dst")))
        .distinct().localCheckpoint(true)
      // stability: both sides are distinct sets, so equal counts plus
      // an empty one-sided difference prove set equality; the (count,
      // hash-sum) pre-check skips the exceptAll on rounds that visibly
      // changed the set
      val nextFp = fingerprint(next)
      converged = nextFp == edgesFp && next.exceptAll(edges).isEmpty
      edges = next
      edgesFp = nextFp
    }
    // stars: every edge points a node at its component min; the roots
    // label themselves
    edges.select(col("src").as("node"), col("dst").as("cluster"))
      .union(edges.select(col("dst").as("node"), col("dst").as("cluster")))
      .distinct()
      .localCheckpoint(true) -> rounds
  }

  /** Incremental near-dup screen: which documents of a NEW batch are
    * near-dups (n-gram Jaccard ≥ threshold) of an EXISTING corpus — the
    * recurring pretraining shape (dedup this week's crawl against the
    * already-ingested corpus) where the self-join families above answer
    * the one-shot question. Returns (batch_id, corpus_id, jaccard).
    *
    * Scale shape: MinHash band buckets are computed per side and the
    * candidate join is batch-bands ⋈ corpus-bands on (band, bucket) —
    * cost O(batch·bands) against the corpus bucket table, never
    * batch × corpus; a pair sharing several buckets is kept only at the
    * first band where the two 32-slot vectors agree (the same
    * no-second-shuffle dedup as [[minHashLshPairs]]). Candidates are
    * then verified EXACTLY by intersecting the two sides' hashed
    * shingle sets, so precision is exact and recall is the LSH band
    * curve (P[miss | J=0.6] ≈ 4e-4 at 32×3). In production the corpus
    * side's banded signatures would be precomputed once and reused per
    * batch — pass `corpusBanded`/`corpusSets` built by one prior call
    * to skip re-reading the corpus (both are plain DataFrames a caller
    * can persist or write out).
    *
    * Reference frame: the reference has no incremental dedup; this is a
    * library extension in the q45/q46 family. */
  def incrementalNearDups(batch: DataFrame, corpus: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 3,
      threshold: Double = 0.6, bands: Int = Bands,
      shinglePersist: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.NONE): DataFrame = {
    require(bands >= 1 && bands <= NumHashes && NumHashes % bands == 0,
      s"bands must divide the $NumHashes-hash signature, got $bands")
    // each side's per-doc hash-set relation feeds its signature path AND
    // the verify join — one scan+aggregation per side (pre-r16 each side
    // ran the shingle pipeline twice); same opt-in cache trade as
    // minHashLshPairs
    def maybePersist(df: DataFrame) =
      if (shinglePersist == org.apache.spark.storage.StorageLevel.NONE) df
      else df.persist(shinglePersist)
    val setsB = maybePersist(docHashSets(batch, idCol, textCol, n))
    val setsC = maybePersist(docHashSets(corpus, idCol, textCol, n))
    val l = bandedFromSets(setsB, NumHashes, bands)
      .select(col("band"), col("bucket"),
        col("doc_id").as("batch_id"), col("bhs").as("ba"))
    val r = bandedFromSets(setsC, NumHashes, bands)
      .select(col("band"), col("bucket"),
        col("doc_id").as("corpus_id"), col("bhs").as("bb"))
    val cands = l.join(r, Seq("band", "bucket"))
      .filter(col("band") === firstEqualBand)
      .select(col("batch_id"), col("corpus_id"))
    // no broadcast hint here: the sides scale independently (a small
    // batch against a 100 TB corpus), so the join strategy is left to
    // the planner's runtime stats
    verifySets(cands, setsB, setsC, threshold, broadcastSets = false,
      aId = "batch_id", bId = "corpus_id")
  }

  /** Incremental screen over the fixture corpus: documents with
    * doc_id % 3 = 0 play the incoming batch, the rest the standing
    * corpus. The oracle is the exact cross-side Jaccard join — equality
    * means LSH surfaced every true pair and the verifier computed the
    * exact measure on each. */
  val q114IncrementalDedup: QueryDef = QueryDef("q114_incremental_dedup",
    s"""WITH $duckShingleCte,
       |inter AS (
       |  SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id, count(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle
       |  WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
       |  GROUP BY 1, 2)
       |SELECT batch_id, corpus_id,
       |  CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
       |FROM inter
       |JOIN cnt ca ON ca.doc_id = batch_id
       |JOIN cnt cb ON cb.doc_id = corpus_id
       |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.6
       |ORDER BY batch_id, corpus_id""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir).documents
    // measured neutral with shinglePersist at fixture scale (the
    // materialization cost cancels the saved recompute), so the driver
    // row keeps the scale-safe default; the param stays for callers
    // whose shingle relation is the bottleneck
    incrementalNearDups(docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 =!= 0))
      .orderBy(col("batch_id"), col("corpus_id"))
  }

  /** Near-dup clusters over the documents corpus: the exact q45 Jaccard
    * pairs (threshold 0.6) closed under transitivity. The oracle states
    * the same thing as a recursive transitive closure with a MIN label —
    * tractable in SQL only because dup components are tiny; the engine
    * side is the distributed iteration that survives at corpus scale. */
  val q49DupClusters: QueryDef = QueryDef("q49_dup_clusters",
    s"""WITH RECURSIVE $duckShingleCte,
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN cnt ca ON ca.doc_id = id_a
       |  JOIN cnt cb ON cb.doc_id = id_b
       |  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.6),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS node, LEAST(a, MIN(b)) AS cluster
       |FROM reach GROUP BY a
       |ORDER BY node""".stripMargin) { (spark, dir) =>
    // r14: the star-contraction path (O(log n) rounds); DedupSpec pins
    // it row-identical to the propagation operator on the same pairs
    dupClustersStar(ngramJaccardPairs(Tables(spark, dir).documents,
      shinglePersist = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      .orderBy(col("node"))
  }

  /** Corpus-frequency span masking (exact substring dedup à la
    * "Deduplicating Training Data Makes Language Models Better"): per
    * document, the maximal token spans covered by n-gram shingles that
    * occur in ≥ `minDocs` DISTINCT documents — the spans a pretraining
    * pipeline cuts out so boilerplate repeated across the corpus is not
    * memorized verbatim. Overlapping/adjacent hot shingles merge into one
    * span via gaps-and-islands over the running max span end.
    *
    * Scale shape: token explode (|tokens| rows, map-side), ONE global
    * shingle-frequency aggregate (two-phase, map-combined), an equi-join
    * of positions onto the hot set (hot shingles are few by construction
    * — frequency ≥ minDocs), and a per-document window. No all-pairs
    * anything; the corpus is never collected. */
  def repeatedSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2, s"need n >= 1, minDocs >= 2: $n, $minDocs")
    val posW = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ", -1)).as(Seq("i", "w")))
    val sh = toks
      .withColumn("shingle",
        concat_ws(" ", (0 until n).map(k => lead(col("w"), k).over(posW)): _*))
      // a tail window shorter than n concatenates fewer words — drop it
      // (computed as a column first: window expressions cannot sit in a
      // WHERE clause)
      .withColumn("_last", lead(col("w"), n - 1).over(posW))
      .filter(col("_last").isNotNull)
      .select(col("doc_id"), col("i"), col("shingle"))
    val hot = sh.groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("shingle"))
    val hits = sh.join(hot, "shingle").select(col("doc_id"), col("i"))
    val prevEnd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val runW = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("pe", max(col("i") + (n - 1)).over(prevEnd))
      .withColumn("st",
        when(col("pe").isNull || col("i") > col("pe") + 1, 1).otherwise(0))
      .withColumn("sid", sum(col("st")).over(runW))
      .groupBy(col("doc_id"), col("sid"))
      .agg(min(col("i")).as("span_start"),
        (max(col("i")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_shingles"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_shingles"))
  }

  /** Driver row: 3-gram spans repeated in ≥ 2 documents, fixture corpus. */
  val q118RepeatedSpans: QueryDef = QueryDef("q118_repeated_spans",
    """WITH toks AS (
      |  SELECT doc_id, i - 1 AS i, w FROM (
      |    SELECT doc_id,
      |      unnest(string_split(text, ' ')) AS w,
      |      generate_subscripts(string_split(text, ' '), 1) AS i
      |    FROM documents)),
      |sh AS (
      |  SELECT doc_id, i,
      |    w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      |  FROM toks
      |  WINDOW win AS (PARTITION BY doc_id ORDER BY i)
      |  QUALIFY lead(w, 2) OVER win IS NOT NULL),
      |hot AS (
      |  SELECT shingle FROM sh GROUP BY shingle
      |  HAVING count(DISTINCT doc_id) >= 2),
      |hits AS (
      |  SELECT s.doc_id, s.i FROM sh s JOIN hot h USING (shingle)),
      |isl AS (
      |  SELECT doc_id, i,
      |    CASE WHEN max(i + 2) OVER (PARTITION BY doc_id ORDER BY i
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |         OR i > max(i + 2) OVER (PARTITION BY doc_id ORDER BY i
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
      |         THEN 1 ELSE 0 END AS st
      |  FROM hits),
      |sp AS (
      |  SELECT doc_id, i,
      |    SUM(st) OVER (PARTITION BY doc_id ORDER BY i
      |                  ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM isl)
      |SELECT doc_id, min(i) AS span_start, max(i) + 2 AS span_end,
      |  count(*) AS n_shingles
      |FROM sp GROUP BY doc_id, sid
      |ORDER BY doc_id, span_start""".stripMargin) { (spark, dir) =>
    repeatedSpans(Tables(spark, dir).documents, n = 3, minDocs = 2)
      .orderBy(col("doc_id"), col("span_start"))
  }
}
