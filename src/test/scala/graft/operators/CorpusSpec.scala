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
}
