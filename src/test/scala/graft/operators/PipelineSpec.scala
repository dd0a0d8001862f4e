package graft.operators

import graft.SparkSpec

/** Behavior specs for the LLM-pipeline operators (dedup / similarity):
  * the oracle gate pins exact results; these pin the *statistical*
  * contracts (recall of the approximate paths vs the exact baselines). */
class PipelineSpec extends SparkSpec {

  private def pairSet(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, sf("sf0.01"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-lsh finds exactly the brute-force jaccard pairs") {
    val exact = pairSet("q45_ngram_jaccard")
    val lsh = pairSet("q46_minhash_lsh")
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    assert(lsh == exact)
  }

  test("simhash hamming<=5 pairs cover the jaccard>=0.6 near-dups") {
    val planted = pairSet("q45_ngram_jaccard")
    val simhash = pairSet("q48_simhash_pairs")
    val recall = planted.count(simhash.contains).toDouble / planted.size
    assert(recall >= 0.9, s"simhash recall $recall over ${planted.size} pairs")
  }

  test("ann-lsh top-3 recall >= 0.7 vs brute-force knn") {
    val knn = graft.SparkEntry.queries("q50_cosine_knn")(spark, sf("sf0.01"))
      .filter("rnk <= 3").select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(spark, sf("sf0.01"))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = knn.count(ann.contains).toDouble / knn.size
    assert(recall >= 0.7, s"ANN recall $recall (${knn.size} truth pairs)")
  }

  test("ann-ivf top-3 recall >= 0.7 vs brute-force knn") {
    import org.apache.spark.sql.functions.col
    val knn = graft.SparkEntry.queries("q50_cosine_knn")(spark, sf("sf0.01"))
      .filter("rnk <= 3").select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvfNeighbors(
      graft.core.Catalog.load(spark, sf("sf0.01"), "embeddings"),
      col("vec_id") < 20, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = knn.count(ivf.contains).toDouble / knn.size
    assert(recall >= 0.7, s"IVF recall $recall (${knn.size} truth pairs)")
  }

  test("ann-ivf is run-to-run deterministic (decimal Lloyd updates)") {
    import org.apache.spark.sql.functions.col
    def run(): Seq[(Long, Long, Long)] =
      Similarity.annIvfNeighbors(
        graft.core.Catalog.load(spark, sf("sf0.01"), "embeddings"),
        col("vec_id") < 20, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run() == run(),
      "two identical IVF runs diverged - centroid training is order-dependent")
  }

  test("keep-first dedup retains the earliest event per key") {
    import org.apache.spark.sql.functions._
    val deduped = graft.SparkEntry.queries("q43_dedup_keep_first")(spark, sf())
    val events = graft.core.Catalog.load(spark, sf(), "events")
    val keys = events.select("user_id", "event_type").distinct().count()
    assert(deduped.count() == keys)
    // spot-check one key: kept event must have the min ts
    val k = events.select("user_id", "event_type").first()
    val kept = deduped.filter(col("user_id") === k.getLong(0) &&
      col("event_type") === k.getString(1)).select("event_id").first().getLong(0)
    val earliest = events.filter(col("user_id") === k.getLong(0) &&
      col("event_type") === k.getString(1))
      .orderBy(col("ts"), col("event_id")).select("event_id").first().getLong(0)
    assert(kept == earliest)
  }

  test("approx percentile within 2% of exact percentile_cont") {
    import org.apache.spark.sql.functions._
    val t = graft.core.Catalog.load(spark, sf("sf0.01"), "lineitem")
    val both = t.groupBy(col("l_returnflag")).agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx"),
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("exact"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / e < 0.02, s"${r.getString(0)}: approx $a exact $e")
    }
  }
}
