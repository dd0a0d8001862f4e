package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.core.Tables

/** Behavior of the scrubbing operators on text that actually contains
  * PII / repetition (the fixture corpus is synthetic and clean, so the
  * oracle-gated queries only prove engine agreement on no-ops). */
class ScrubSpec extends SparkSpec {

  import spark.implicits._

  test("piiRedact masks emails, cards, IPs and phones with counts") {
    val docs = Seq(
      (1L, "contact alice@example.com or bob.smith+x@mail.co today"),
      (2L, "card 4111111111111111 from 10.0.0.1 call +1 (555) 123-4567"),
      (3L, "clean text with no identifiers at all")).toDF("doc_id", "text")
    val out = Scrub.piiRedact(docs).orderBy("doc_id").collect()
    assert(out(0) === Row(1L,
      "contact <EMAIL> or <EMAIL> today", 2L, 0L, 0L, 0L, 0L))
    assert(out(1) === Row(2L,
      "card <CARD> from <IP> call <PHONE>", 0L, 1L, 0L, 1L, 1L))
    assert(out(2) === Row(3L,
      "clean text with no identifiers at all", 0L, 0L, 0L, 0L, 0L))
  }

  test("card numbers are claimed by the card stage, not the phone stage") {
    val docs = Seq((1L, "pay 5500005555555559 now")).toDF("doc_id", "text")
    val r = Scrub.piiRedact(docs).collect().head
    assert(r.getString(1) === "pay <CARD> now")
    assert(r.getLong(2) === 0L && r.getLong(3) === 1L && r.getLong(6) === 0L)
  }

  test("separator-grouped cards are claimed whole by the card stage") {
    val docs = Seq(
      (1L, "pay 4111-1111-1111-1111 now"),
      (2L, "pay 4111 1111 1111 1111 now")).toDF("doc_id", "text")
    val out = Scrub.piiRedact(docs).orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getString(1) === "pay <CARD> now", r.getString(1))
      assert(r.getLong(3) === 1L && r.getLong(6) === 0L)
    }
  }

  test("17+ digit runs are masked whole, never part-claimed by phone") {
    val docs = Seq((1L, "ref 12345678901234567890 end")).toDF("doc_id", "text")
    val r = Scrub.piiRedact(docs).collect().head
    assert(r.getString(1) === "ref <NUM> end", r.getString(1))
    assert(r.getLong(3) === 0L && r.getLong(4) === 1L && r.getLong(6) === 0L)
  }

  test("bare 10-digit phone formats redact without a country code") {
    val docs = Seq(
      (1L, "call 555-123-4567 today"),
      (2L, "or (555) 123-4567 works"),
      (3L, "even 5551234567 bare")).toDF("doc_id", "text")
    val out = Scrub.piiRedact(docs).orderBy("doc_id").collect()
    assert(out.forall(_.getLong(6) == 1L), out.map(_.getString(1)).mkString("; "))
    assert(out(0).getString(1) === "call <PHONE> today")
    assert(out(1).getString(1) === "or <PHONE> works")
    assert(out(2).getString(1) === "even <PHONE> bare")
  }

  test("repetitionSignals flags degenerate repetition and keeps clean text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
        "kilo lima mike november oscar papa quebec romeo sierra tango " +
        "uniform victor whiskey xray yankee zulu"),
      (3L, "one")).toDF("doc_id", "text")
    val out = Scrub.repetitionSignals(docs).orderBy("doc_id").collect()
    // doc 1: 6 words, 1 distinct -> dup 0.833333; bigram "spam spam" x5
    // covers 5*9=45 chars of 29 -> ratio > 1, keep=0
    assert(out(0).getLong(1) === 6L)
    assert(out(0).getDouble(2) === 0.833333)
    assert(out(0).getString(3) === "spam spam")
    assert(out(0).getDouble(4) > 1.0)
    assert(out(0).getLong(5) === 0L)
    // doc 2: all distinct -> dup 0, every bigram count 1 -> lexicographic
    // tie-break, small ratio, keep=1
    assert(out(1).getDouble(2) === 0.0)
    assert(out(1).getLong(5) === 1L)
    // doc 3: single word -> no bigram, keep=1 by definition
    assert(out(2).isNullAt(3) && out(2).getLong(5) === 1L)
  }

  test("repetition thresholds are caller-tunable") {
    val docs = Seq((1L, "a b a b a b a b")).toDF("doc_id", "text")
    val strict = Scrub.repetitionSignals(docs, maxDupWordFrac = 0.5).collect().head
    val lax = Scrub.repetitionSignals(docs, maxDupWordFrac = 1.0,
      maxTopBigramRatio = 10.0).collect().head
    assert(strict.getLong(5) === 0L)
    assert(lax.getLong(5) === 1L)
  }

  test("gopherGates: each gate fires on the text class it guards") {
    val docs = Seq(
      (1L, Seq.fill(40)("assorted plain words that read like prose the a of")
        .mkString(" ")),                             // clean → keep
      (2L, "too short the a"),                       // word-count gate
      (3L, Seq.fill(50)("ab cd ef gh the a").mkString(" ")), // mean-word-len low
      (4L, Seq.fill(50)("the a $$ ## %% !! ?? ++ == ~~").mkString(" ")), // symbols
      (5L, Seq.fill(60)("spark spark spark distinct1 distinct2").mkString(" ")), // no stop words + top-word
      (6L, ("the a of " + Seq.tabulate(60)(i => s"word$i").mkString(" ")))  // clean, distinct words
    ).toDF("doc_id", "text")
    val g = Scrub.gopherGates(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(g(1L).getAs[Boolean]("keep"))
    assert(g(6L).getAs[Boolean]("keep"))
    assert(!g(2L).getAs[Boolean]("pass_words"))
    assert(!g(3L).getAs[Boolean]("pass_word_len"))
    assert(!g(4L).getAs[Boolean]("pass_symbols"))
    assert(!g(5L).getAs[Boolean]("pass_stop_words"))
    assert(!g(5L).getAs[Boolean]("pass_top_word"))
    Seq(2L, 3L, 4L, 5L).foreach(id => assert(!g(id).getAs[Boolean]("keep")))
  }

  test("gopherGates is case-insensitive: uppercase is not a symbol and " +
      "The is a stop word") {
    val body = Seq.tabulate(40)(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, s"The A $body"),      // capitalized stop words still count
      (2L, s"the a $body")       // lowercase control — must grade the same
    ).toDF("doc_id", "text")
    val g = Scrub.gopherGates(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // identical signals for both casings: symbol_ratio 0 (letters are
    // letters), stop-word floor met by The/A, same keep verdict
    Seq("symbol_ratio", "top_word_frac").foreach { c =>
      assert(g(1L).getAs[Double](c) === g(2L).getAs[Double](c), c)
    }
    assert(g(1L).getAs[Long]("n_stop_words") ===
      g(2L).getAs[Long]("n_stop_words"))
    assert(g(1L).getAs[Boolean]("keep") === g(2L).getAs[Boolean]("keep"))
    assert(g(1L).getAs[Double]("symbol_ratio") === 0.0)
    assert(g(1L).getAs[Long]("n_stop_words") === 2L)
  }

  test("gopherGates top-word fraction equals the explode-and-count answer") {
    val docs = Seq(
      (1L, "x y x z x y w"),        // x appears 3 of 7
      (2L, "a b c d"),              // all distinct: 1 of 4
      (3L, "q q q q")               // degenerate: 4 of 4
    ).toDF("doc_id", "text")
    val got = Scrub.gopherGates(docs, minWords = 1L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("top_word_frac"))
      .toMap
    assert(got(1L) === 3.0 / 7)
    assert(got(2L) === 1.0 / 4)
    assert(got(3L) === 1.0)
  }

  test("gopherGates plans with zero shuffles (pure map-side projection)") {
    val df = Scrub.gopherGates(
      Tables(spark, sf()).documents)
    df.queryExecution.toRdd.count()
    val shuffles = planNodes(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"gopherGates must not shuffle:\n${df.queryExecution.executedPlan}")
  }
}
