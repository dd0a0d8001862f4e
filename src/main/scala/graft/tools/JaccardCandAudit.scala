package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.functions._

/** Dev utility (VERDICT r15 #2): split the exact-Jaccard candidate set
  * at a given scale into
  *
  *  - `r15_candidate_pairs`   — the r15 prefix-join candidates (no
  *    size/positional filter), the set whose sf3 growth was the
  *    unadjudicated 4.7×-for-3× in q49,
  *  - `r16_candidate_pairs`   — after the PPJoin size + positional
  *    filters ([[graft.operators.Dedup.prefixCandidates]]),
  *  - `true_pairs`            — pairs that pass exact verification
  *    (Jaccard ≥ t), the floor no exact algorithm can go below,
  *
  * so the superlinear share attributable to FALSE candidates (algorithmic
  * fanout, fixable) separates from genuine near-dup pair growth
  * (data-inherent to the salt-tiled fixtures). Counts come from the
  * kernel's own relations (`Dedup.hashedShingles` / `prefixCandidates`),
  * not a reimplementation.
  *
  * Usage: runMain graft.tools.JaccardCandAudit <sfDir> <outFile> <label>
  */
object JaccardCandAudit {
  def main(args: Array[String]): Unit = {
    val (dir, outFile, label) = (args(0), args(1), args(2))
    val spark = graft.core.SessionFactory.local("graft-cand-audit")
    val docs = graft.core.Catalog.load(spark, dir, "documents")
    val t = 0.6
    val hashed = graft.operators.Dedup.hashedShingles(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = hashed.select("doc_id").distinct().count()
    val r15 = graft.operators.Dedup
      .prefixCandidates(hashed, t, positional = false).count()
    val r16 = graft.operators.Dedup
      .prefixCandidates(hashed, t, positional = true).count()
    val truePairs = graft.operators.Dedup.ngramJaccardPairs(docs,
      shinglePersist = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .count()
    val falseR15 = r15 - truePairs
    val falseR16 = r16 - truePairs
    val line =
      s"""{"sf": "$label", "docs": $nDocs, "threshold": $t,""" +
        s""" "r15_candidate_pairs": $r15, "r16_candidate_pairs": $r16,""" +
        s""" "true_pairs": $truePairs, "false_candidates_r15": $falseR15,""" +
        s""" "false_candidates_r16": $falseR16}"""
    println(line)
    val out = new PrintWriter(new java.io.FileWriter(outFile, true))
    out.println(line)
    out.close()
    spark.stop()
  }
}
