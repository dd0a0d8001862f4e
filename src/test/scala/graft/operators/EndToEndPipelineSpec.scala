package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The "switch your pretraining data pipeline to this library" story,
  * exercised end-to-end as ONE composed dataflow over the fixture corpus:
  *
  *   raw documents
  *     → PII redaction                  (Scrub.piiRedact)
  *     → Gopher quality gates           (Scrub.gopherGates + tokenCounts)
  *     → soft dedup                     (Sampling.clusterWeightedSample)
  *     → per-domain token budget        (Sampling.tokenBudgetCap)
  *     → temperature source mixture     (Sampling.temperatureMixture)
  *     → token-budget sequence packing  (Packing.packByTokenBudget)
  *
  * Each operator is individually oracle-checked by its own driver row;
  * this spec pins what the gate cannot see — that the stages COMPOSE
  * (schemas line up, selections are subsets, nothing explodes or leaks
  * between stages) and that the whole chain is deterministic. */
class EndToEndPipelineSpec extends SparkSpec {

  private def pipeline(): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = Tables(spark, sf("sf0.01")).documents
    // 1) redact PII in place, keep the lineage columns out of the flow
    val clean = Scrub.piiRedact(docs)
      .select(col("doc_id"), col("redacted").as("text"))
      .join(docs.select(col("doc_id"), col("lang"), col("source")), "doc_id")
    // 2) quality gates: the Gopher battery (word count / word length /
    //    symbols / stop words / concentration) plus a diversity floor
    //    from the token signals
    val signals = TextAnalysis.tokenCounts(clean)
    val gates = Scrub.gopherGates(clean)
      .filter(col("keep")).select(col("doc_id"))
    val quality = clean.join(signals, "doc_id").join(gates, "doc_id")
      .filter(col("n_uniq_tokens").cast("double") / col("n_ws_tokens") >= 0.3)
      .select(col("doc_id"), col("text"), col("source"), col("n_bpe_tokens"))
    // 3) soft dedup: canonical per content cluster + 1/size survivors
    val kept = Sampling.clusterWeightedSample(quality, "doc_id", "text")
    val deduped = quality.join(kept.select(col("doc_id")), "doc_id")
    // 4) per-domain token budget: no source may contribute more than its
    //    token allowance to the mixture
    val budgeted = deduped.join(
      Sampling.tokenBudgetCap(deduped, "source", "doc_id", "text",
        budgetTokens = 1000L, seed = 17).select(col("doc_id")), "doc_id")
    // 5) temperature mixture across sources (flatten toward the tail)
    val mixed = Sampling.temperatureMixture(budgeted, "source", "doc_id",
      alpha = 0.5, targetFrac = 0.8, seed = 3)
    // 6) pack into ≤ 4096-token training sequences
    val packed = Packing.packByTokenBudget(
      mixed.select(col("doc_id"), col("n_bpe_tokens")),
      "doc_id", "n_bpe_tokens", budget = 4096L)
    (clean, quality,
      mixed.select(col("doc_id"), col("text"), col("source"),
        col("n_bpe_tokens")), packed)
  }

  test("stages compose: monotone selection, no leaks, packs within budget") {
    val docs = Tables(spark, sf("sf0.01")).documents
    val (clean, quality, selected, packed) = pipeline()
    val n0 = docs.count()
    val n1 = clean.count()
    val n2 = quality.count()
    val n3 = selected.count()
    // redaction is 1:1; every later stage only removes rows
    assert(n1 == n0, s"redaction changed cardinality: $n0 -> $n1")
    assert(n2 <= n1 && n2 > 0, s"quality gate: $n1 -> $n2")
    assert(n3 <= n2 && n3 > 0, s"dedup+mixture: $n2 -> $n3")
    // selections are subsets (no stage invents documents)
    assert(quality.select("doc_id").exceptAll(clean.select("doc_id")).isEmpty)
    assert(selected.select("doc_id").exceptAll(quality.select("doc_id")).isEmpty)
    // no PII pattern survives into the packed corpus' source documents
    val leaky = clean.filter(
      col("text").rlike("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}")).count()
    assert(leaky == 0, s"$leaky docs still carry an email after redaction")
    // packing contract: token conservation, contiguity (pack_id is
    // non-decreasing in doc order), and each pack overhangs the budget
    // by at most one straddling document
    val inTok = selected.agg(sum(col("n_bpe_tokens"))).head.getLong(0)
    val outTok = packed.agg(sum(col("n_bpe_tokens"))).head.getLong(0)
    assert(inTok == outTok, s"packing lost tokens: $inTok vs $outTok")
    assert(packed.count() == selected.count(), "packing changed cardinality")
    val rows = packed.select(col("doc_id"), col("pack_id"), col("n_bpe_tokens"))
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(1)).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)), "pack_id not monotone in doc order")
    val maxDoc = rows.map(_.getLong(2)).max
    val byPack = rows.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(byPack.values.forall(_ <= 4096L + maxDoc),
      "a pack exceeds budget + one straddling document")
    assert(byPack.nonEmpty)
  }

  test("the whole chain is deterministic end-to-end") {
    val (_, _, _, packedA) = pipeline()
    val (_, _, _, packedB) = pipeline()
    assert(packedA.collect().map(_.toSeq).toSet ==
      packedB.collect().map(_.toSeq).toSet)
  }
}
