package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JVM-static concurrency probe for the async-lookup spec (statics are
  * shared with local-mode executor threads, unlike closure fields, which
  * are serialized per task). */
object AsyncProbe {
  val cur = new java.util.concurrent.atomic.AtomicInteger(0)
  val max = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** JVM-static open/close ledger for the store-client lifecycle spec. */
object StoreProbe {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val doubleCloses = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0); doubleCloses.set(0) }
}

/** A store client whose close() is NOT idempotent — the real-RPC
  * contract the lifecycle must respect (ADVICE r14: refill + the
  * task-completion listener double-closed). */
class StrictStoreClient extends AsyncLookup.StoreClient[Long, Long] {
  StoreProbe.opens.incrementAndGet()
  private var closed = false
  def fetch(key: Long): Long = key * 7
  override def close(): Unit =
    if (closed) {
      StoreProbe.doubleCloses.incrementAndGet()
      throw new IllegalStateException("store client closed twice")
    } else { closed = true; StoreProbe.closes.incrementAndGet() }
}

/** The pipeline operators are a library, not a fixture harness: this spec
  * drives the generic entry points on freshly-built DataFrames with
  * non-fixture column names and verifies the operator contracts hold. */
class ApiSpec extends SparkSpec {

  test("async lookup join overlaps slow lookups and preserves input order") {
    import spark.implicits._
    val n = 32
    val ds = (1L to n).toDF("id").repartition(2).as[Long]
    AsyncProbe.cur.set(0); AsyncProbe.max.set(0)
    val out = AsyncLookup.asyncLookupJoin[Long, Long, (Long, Long)](
      ds, { id =>
        // track in-flight concurrency (local mode: executors share the
        // JVM, so the statics are the same objects the test reads)
        val c = AsyncProbe.cur.incrementAndGet()
        AsyncProbe.max.accumulateAndGet(c, math.max)
        Thread.sleep(50)
        AsyncProbe.cur.decrementAndGet()
        id * 10
      }, capacity = 16,
      (id, v) => (id, v)).collect()
    assert(out.length == n)
    assert(out.forall(p => p._1 * 10 == p._2))
    // a sequential pipeline would never have two lookups in flight; the
    // concurrency oracle is immune to machine-load timing flake
    assert(AsyncProbe.max.get() > 1,
      s"lookups never overlapped (max in-flight ${AsyncProbe.max.get()})")
  }

  test("store-client async lookup closes each partition's client " +
      "exactly once — a non-idempotent close() survives drain + " +
      "task-completion teardown") {
    import spark.implicits._
    StoreProbe.reset()
    val ds = (1L to 20L).toDF("id").repartition(2).as[Long]
    val out = AsyncLookup.asyncLookupJoinStore[Long, Long, Long, (Long, Long)](
      ds, () => new StrictStoreClient, (l: Long) => l, capacity = 4,
      (l, v) => (l, v)).collect()
    assert(out.length == 20 && out.forall(p => p._1 * 7 == p._2))
    assert(StoreProbe.doubleCloses.get() == 0, "client closed twice")
    assert(StoreProbe.opens.get() >= 1)
    assert(StoreProbe.opens.get() == StoreProbe.closes.get(),
      s"opens ${StoreProbe.opens.get()} != closes ${StoreProbe.closes.get()}")
  }

  test("r15 block-grid exact cosine equals the broadcast kernels " +
      "bit-for-bit and the broadcast entries auto-route past the cap") {
    import spark.implicits._
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d => (math.sin(i * 13.0 + d * 7.0) * 10).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val bPairs = Similarity.cosineNearDupPairs(spark, emb, 0.2)
      .collect().toSeq
    // cellRows = 7 forces ceil(120/7) = 18 blocks — deep grid on 60 rows
    val gPairs = Similarity.cosineNearDupPairsGrid(spark, emb, 0.2,
      cellRows = 7).collect().toSeq
    assert(bPairs.nonEmpty && bPairs == gPairs,
      s"grid pairs diverge: ${bPairs.size} vs ${gPairs.size}")
    val bKnn = Similarity.cosineKnn(spark, emb, col("vec_id") < 9, k = 4)
      .collect().toSeq
    val gKnn = Similarity.cosineKnnGrid(spark, emb, col("vec_id") < 9,
      k = 4, cellRows = 7).collect().toSeq
    assert(bKnn.nonEmpty && bKnn == gKnn,
      s"grid knn diverges: $bKnn vs $gKnn")
    // a cap below the corpus size routes the broadcast entries onto the
    // grid path (no driver materialization) with the identical answer
    val autoKnn = Similarity.cosineKnn(spark, emb, col("vec_id") < 9,
      k = 4, maxCorpusRows = 10).collect().toSeq
    assert(autoKnn == bKnn)
    val autoPairs = Similarity.cosineNearDupPairs(spark, emb, 0.2,
      maxCorpusRows = 10).collect().toSeq
    assert(autoPairs == bPairs)
  }

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "the quick brown fox jumps over the lazy dog again and once"),
      (12L, "completely different words about spark query engines and scale"),
      (13L, "another unrelated sentence mentioning tables joins and shuffles wide")
    ).toDF("id", "body")
  }

  test("ngram jaccard + minhash-lsh agree on custom column names") {
    val exact = Dedup.ngramJaccardPairs(corpus, "id", "body", n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(corpus, "id", "body", n = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((10L, 11L)), s"got $exact")
    assert(lsh == exact)
  }

  test("incremental near-dup screen finds batch-vs-corpus pairs only") {
    // batch doc 20 is a near-dup of corpus doc 10; batch doc 21 of
    // nothing; corpus docs 10/11 are near-dups of EACH OTHER but a
    // within-corpus pair must never surface from the cross-side screen
    import spark.implicits._
    val batch = Seq(
      (20L, "the quick brown fox jumps over the lazy dog again and twice"),
      (21L, "fresh crawl content with entirely novel vocabulary throughout here")
    ).toDF("id", "body")
    val got = Dedup.incrementalNearDups(batch, corpus, "id", "body",
        n = 3, threshold = 0.5)
      .select("batch_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((20L, 10L), (20L, 11L)), s"got $got")
  }

  test("simhash fingerprints place near-dups close in hamming space") {
    val fp = Dedup.simhashFingerprints(corpus, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(dist(10L, 11L) < dist(10L, 12L))
    assert(dist(10L, 11L) < dist(10L, 13L))
  }

  test("cosine knn on a custom embeddings frame") {
    import spark.implicits._
    // orthogonal-ish unit vectors: 0-1 close, 2 far
    val dim = 64
    def vec(hot: Int, bleed: Int): Array[Float] = {
      val a = new Array[Float](dim); a(hot) = 1f; a(bleed) = 0.4f; a
    }
    val emb = Seq(
      (100L, vec(0, 1)), (101L, vec(0, 2)), (102L, vec(5, 6))
    ).toDF("eid", "v")
    val knn = Similarity.cosineKnn(spark, emb, col("eid") === 100L, k = 1,
      idCol = "eid", vecCol = "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(knn == Set((100L, 101L)))
  }

  test("the BROADCAST-side cap still fails fast where no grid twin " +
      "exists (crossCosineNearDups broadcasts the batch side by contract)") {
    import spark.implicits._
    // cosineKnn/cosineNearDupPairs no longer refuse — they auto-route to
    // the block-grid kernels (r15, pinned above); the semantic screen's
    // BATCH side is small by contract and keeps the fail-fast
    val emb = (0L to 9L).map(i => (i, Array.fill(64)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.crossCosineNearDups(spark, emb, emb, 0.5,
        maxBatchRows = 5).collect()
    }
    assert(e.getMessage.contains("annLsh"), e.getMessage)
  }

  test("exact-topk audit kernel refuses a corpus beyond the broadcast cap") {
    import spark.implicits._
    // the in_exact_topk audit column inside q52/q93 must fail fast past
    // the cap (pointing at the distributed ANN entry points) rather than
    // collect an unbounded corpus onto the driver
    val emb = (0L to 9L).map(i => (i, Array.fill(64)(i.toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.exactTopkRaw(emb, col("vec_id") === 0L, k = 1, maxRows = 5)
        .collect()
    }
    assert(e.getMessage.contains("annLshNeighbors"))
    // within the cap the same kernel runs fine
    assert(Similarity.exactTopkRaw(emb, col("vec_id") === 0L, k = 1,
      maxRows = 100).collect().nonEmpty)
  }

  test("annLshNeighbors runs on a custom schema with a custom predicate") {
    import spark.implicits._
    val dim = 64
    def vec(hot: Int, bleed: Int): Array[Float] = {
      val a = new Array[Float](dim); a(hot) = 1f; a(bleed) = 0.4f; a
    }
    val emb = Seq(
      (100L, vec(0, 1)), (101L, vec(0, 2)), (102L, vec(5, 6))
    ).toDF("eid", "v")
    val out = Similarity.annLshNeighbors(emb, col("eid") === 100L, k = 2,
      idCol = "eid", vecCol = "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall(_._1 == 100L) && out.nonEmpty)
  }

  test("as-of join on a custom dimension enriches with the latest version") {
    import spark.implicits._
    val facts = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"))
      .toDF("k", "t", "payload")
    val dim = Seq((1L, 50L, 7L, "v1"), (1L, 150L, 8L, "v2"), (2L, 500L, 9L, "late"))
      .toDF("k", "t", "ver", "dimval")
    val out = AsOfJoin.asOfJoin(facts, dim, key = "k",
      leftTs = "t", rightTs = "t", rightTieBreak = "ver",
      valueCols = Seq("ver", "dimval"))
      .select("k", "t", "payload", "dimval")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 100L, "a", "v1"),  // only v1 (t=50) precedes t=100
      (1L, 200L, "b", "v2"),  // v2 (t=150) is latest before t=200
      (2L, 150L, "c", null))) // dim version arrives later -> null
  }

  test("as-of join takes all values from the SAME latest right row") {
    import spark.implicits._
    // the latest version (t=150) has a NULL dimval: real ASOF semantics
    // return NULL — not a stale "v1" backfilled from the older version
    val facts = Seq((1L, 200L, "a")).toDF("k", "t", "payload")
    val dim = Seq((1L, 50L, 7L, Option("v1")), (1L, 150L, 8L, Option.empty[String]))
      .toDF("k", "t", "ver", "dimval")
    val out = AsOfJoin.asOfJoin(facts, dim, key = "k",
      leftTs = "t", rightTs = "t", rightTieBreak = "ver",
      valueCols = Seq("ver", "dimval"))
      .select("k", "ver", "dimval").collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 8L, "must carry the latest version's ver")
    assert(out(0).isNullAt(2), "NULL field of the latest version must stay NULL")
  }

  test("dupClusters closes pairs under transitivity on custom columns") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3: needs multiple propagation rounds),
    // clique {10,11,12}, isolated pair {20,21}; 99 appears in no pair
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (21L, 20L))
      .toDF("left_doc", "right_doc")
    val got = Dedup.dupClusters(pairs, "left_doc", "right_doc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L),
      s"components must be labeled by their minimum node, got $got")
    // r14: the star-contraction variant returns the identical labels
    val star = Dedup.dupClustersStar(pairs, "left_doc", "right_doc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == got, s"star contraction disagrees: $star")
  }

  test("r14 dupClustersStar converges in O(log n) rounds on a skewed " +
    "chain where min-label propagation needs O(diameter)") {
    import spark.implicits._
    // a 512-node path graph: diameter 511 — propagation's worst case
    val n = 512
    val chain = (0 until n - 1).map(i => (i.toLong, i + 1L))
      .toDF("id_a", "id_b")
    val (labels, rounds) =
      Dedup.dupClustersStarCounted(chain, "id_a", "id_b", maxRounds = 32)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.forall(_._2 == 0L),
      s"one component labeled 0 expected, got ${got.take(5)}...")
    assert(rounds <= 12, s"star contraction took $rounds rounds on a " +
      s"$n-chain — expected O(log n)")
    // the propagation operator on the same chain would need ~diameter
    // rounds: its own bound check proves that without paying them
    val e = intercept[IllegalArgumentException](
      Dedup.dupClusters(chain, "id_a", "id_b", maxRounds = 16).collect())
    assert(e.getMessage.contains("did not converge"))
  }

  test("r16: PPJoin size+positional filters are SOUND — the filtered " +
    "candidate set is a subset of the r15 prefix candidates and still a " +
    "superset of every true near-dup pair") {
    val docs = graft.core.Catalog.load(spark, sf(), "documents")
    val t = 0.6
    val hashed = Dedup.hashedShingles(docs).cache()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r15 = pairs(Dedup.prefixCandidates(hashed, t, positional = false))
    val r16 = pairs(Dedup.prefixCandidates(hashed, t, positional = true))
    val truePairs = pairs(Dedup.ngramJaccardPairs(docs)
      .select("id_a", "id_b"))
    assert(r16.subsetOf(r15),
      s"positional filter must only REMOVE candidates; added ${r16 -- r15}")
    assert(truePairs.subsetOf(r16),
      s"positional filter dropped true pairs: ${truePairs -- r16}")
    assert(truePairs.nonEmpty, "fixture must contain near-dup pairs")
    hashed.unpersist()
  }
}
