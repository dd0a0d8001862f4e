package graft.operators

import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior + plan contracts for the corpus-lexical operators, driven on
  * non-fixture schemas. */
class CorpusSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma alpha alpha common"),
      (2L, "beta beta delta common word word"),
      (3L, "epsilon zeta eta theta common rare"),
      (4L, "alpha beta gamma alpha alpha common")).toDF("id", "body")
  }

  test("tfidf ranks a document's repeated rare term above common terms") {
    val top = Corpus.tfidfTopTerms(docs, "id", "body", k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'alpha' is rare across docs but frequent inside doc 1; 'common'
    // appears everywhere, so idf flattens it
    assert(top(1L) == "alpha", top.toString)
    assert(top(3L) != "common")
    // scores are deterministic and the rank is a total order
    val again = Corpus.tfidfTopTerms(docs, "id", "body", k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top == again)
  }

  test("tfidf top-k plans as a WindowGroupLimit; vocabulary as a top-k heap") {
    val t = Corpus.tfidfTopTerms(docs, "id", "body", k = 2)
    t.collect()
    assert(planNodes(t.queryExecution.executedPlan)
      .exists(_.isInstanceOf[WindowGroupLimitExec]),
      s"tfidf should prune per-doc candidates pre-shuffle:\n${t.queryExecution.executedPlan}")
    val v = Corpus.vocabulary(docs, "id", "body", k = 3)
    v.collect()
    assert(planNodes(v.queryExecution.executedPlan)
      .exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      s"vocabulary should plan a top-k heap, not a full sort:\n${v.queryExecution.executedPlan}")
  }

  test("vocabulary counts occurrences and document frequency") {
    val v = Corpus.vocabulary(docs, "id", "body", k = 100).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m = v.map(t => t._1 -> (t._2, t._3)).toMap
    assert(m("alpha") == (6L, 2L))   // 3+3 occurrences in docs 1 and 4
    assert(m("common") == (4L, 4L))
    // ordered by total count desc, then term
    assert(v.head._1 == "alpha")
  }

  test("decontaminate flags only docs sharing an n-gram with the benchmark") {
    val bench = docs.filter(col("id") === 1L)
    val train = docs.filter(col("id") =!= 1L)
    val hits = Corpus.decontaminate(train, bench, "id", "body", n = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 4 repeats doc 1's full 6-word run; docs 2/3 share no 6-gram
    assert(hits == Map(4L -> 1L), hits.toString)
    // at a smaller n, partial overlaps start to surface, monotonically
    val hits3 = Corpus.decontaminate(train, bench, "id", "body", n = 3)
      .collect().map(r => r.getLong(0)).toSet
    assert(hits3.contains(4L))
  }

  test("winnowing detects a shared run of length >= n + w - 1, and only that pair") {
    import spark.implicits._
    // docs 1 and 2 share a 6-word run embedded at DIFFERENT offsets —
    // content-defined winnowing must still align them; doc 3 shares no run
    val run = "one two three four five six"
    val d = Seq(
      (1L, s"pre1 pre2 $run tail1 tail2"),
      (2L, s"zzz $run other words here now"),
      (3L, "totally unrelated content with no overlap at all whatsoever"))
      .toDF("id", "body")
    val pairs = Corpus.sharedSpans(d, "id", "body", n = 4, w = 3,
      minShared = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("shuffle-free winnowing produces the identical fingerprint set") {
    import spark.implicits._
    val d = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "zzz one two three four five six other words"),
      (3L, "short doc"),
      (4L, "x y")).toDF("id", "body")
    val a = Corpus.winnowedFingerprints(d, "id", "body", n = 3, w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Corpus.winnowedFingerprintsShuffleFree(d, "id", "body", n = 3, w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("stop-fingerprint cap drops boilerplate shared by every document") {
    import spark.implicits._
    val boiler = "standard legal footer text here"
    val d = (1L to 5L).map(i => (i, s"unique$i body$i $boiler")).toDF("id", "body")
    // every doc shares the boilerplate run; with the cap below the corpus
    // size those fingerprints are dropped and no pair survives
    val capped = Corpus.sharedSpans(d, "id", "body", n = 3, w = 2,
      minShared = 1, maxDocFreq = 3)
    assert(capped.isEmpty)
    val uncapped = Corpus.sharedSpans(d, "id", "body", n = 3, w = 2,
      minShared = 1, maxDocFreq = 5)
    assert(uncapped.count() == 10L, "all 5-choose-2 boilerplate pairs")
  }

  test("int8 quantization: exact scale, symmetric rounding, error bound") {
    import spark.implicits._
    val e = Seq((1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(e).orderBy("vec_id").collect()
    val q1 = out(0).getSeq[Int](2)
    assert(q1 == Seq(127, -64, 32, 0), q1.toString) // round(-63.5) away from 0
    // scale_r is rounded to 9 dp by the operator
    assert(math.abs(out(0).getDouble(1) - 1.0 / 127) < 1e-9)
    // max abs error bounded by scale/2 for in-range values
    assert(out(0).getDouble(3) <= 1.0 / 127 / 2 + 1e-9)
    // zero vector: scale 0, all-zero codes, zero error
    assert(out(1).getDouble(1) == 0.0 && out(1).getSeq[Int](2).forall(_ == 0))
    assert(out(1).getDouble(3) == 0.0)
  }
}
