package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev utility: ANN recall-vs-cost curves at sf1 (round-9 VERDICT #7).
  *
  * The fixture-scale specs pin recall >= 0.7 at one operating point;
  * this tool measures the CURVE on the ScaleGen-tiled sf1 embeddings,
  * where ground truth is free: every tiled vector is a planted
  * near-duplicate of its base (replica coordinates nudged 1e-3·replica),
  * so a query vector's true nearest neighbors are its replica siblings
  * (base id = vec_id % stride) — no all-pairs scan needed.
  *
  * Sweeps: LSH tables at fixed planes (q52's two knobs), IVF nprobe at
  * fixed nlist (q93), SemDeDup nlist (q119 — cluster count trades
  * within-cluster pair cost against cross-cluster misses). For each
  * point: wall seconds, result size, and sibling-recall@k — the
  * fraction of each query's top-min(k, siblings) true neighbors the
  * operator returned.
  *
  * Usage: runMain graft.tools.AnnRecall <sf1Dir> <outFile> [stride]
  */
object AnnRecall {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outFile = args(1)
    val stride = if (args.length > 2) args(2).toLong else 2000L
    val spark = graft.core.SessionFactory.local("graft-ann-recall")
    import spark.implicits._
    val emb = graft.core.Catalog.load(spark, dir, "embeddings")
    emb.cache().count()
    val out = new PrintWriter(outFile)
    val k = 10

    // sibling ground truth: same base id, different vec_id
    val nReplicas = emb.select((col("vec_id") / stride).cast("long"))
      .distinct().count()
    val queries = col("vec_id") % 97 === 0 // ~1% of vectors as queries
    val nQ = emb.filter(queries).count()

    // HARD ground truth: exact brute-force top-k per query over the full
    // corpus (|queries| x |corpus| dot products — 4M here, a one-off dev
    // cost). Sibling recall alone is too easy a target (cos ~ 0.999999);
    // the hard set is where a recall cliff would hide.
    val qSide = emb.filter(queries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cosExpr = expr(
      """aggregate(zip_with(qe, embedding, (x, y) -> CAST(x AS DOUBLE) * y),
         0D, (a, x) -> a + x) /
         (sqrt(aggregate(transform(qe, x -> CAST(x AS DOUBLE) * x),
            0D, (a, x) -> a + x)) *
          sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x),
            0D, (a, x) -> a + x)))""")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    val truthPairs = emb.crossJoin(broadcast(qSide))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosExpr)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("nid"))
    truthPairs.cache()
    val nTruth = truthPairs.count()

    def recallOf(res: org.apache.spark.sql.DataFrame,
        qCol: String, nCol: String): (Double, Double, Long) = {
      val found = res.select(col(qCol).as("q"), col(nCol).as("n")).cache()
      val hits = found.filter(col("q") % stride === col("n") % stride)
        .groupBy("q").agg(countDistinct("n").as("hits"))
      val truth = math.min(k.toLong, nReplicas - 1)
      // sum over zero rows is null — an operating point with no sibling
      // hits is exactly the low-recall corner the curve measures, so it
      // must record 0.0, not crash the sweep (advice r9)
      val totHits = Option(hits.agg(coalesce(sum("hits"), lit(0L)))
        .head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val hardHits = found.join(truthPairs,
        col("q") === col("qid") && col("n") === col("nid")).count()
      val n = found.count()
      found.unpersist()
      (totHits.toDouble / (nQ * truth), hardHits.toDouble / nTruth, n)
    }

    // --- q52: LSH, sweep tables at planes=4 ---
    Seq(4, 8, 14, 20, 28).foreach { tables =>
      val t0 = System.nanoTime()
      val res = Similarity.annLshNeighbors(emb, queries, k,
        nTables = tables)
      res.cache().count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (rec, hard, rows) = recallOf(res, "query_id", "neighbor_id")
      res.unpersist()
      out.println(s"""{"op":"lsh","tables":$tables,"planes":4,""" +
        s""""wall_sec":$wall,"rows":$rows,"recall":$rec,"hard_recall":$hard}""")
      out.flush()
      System.err.println(
        s"[ann-recall] lsh tables=$tables recall=$rec hard=$hard wall=$wall")
    }

    // --- q93: IVF, sweep nprobe at nlist=16 ---
    Seq(1, 2, 4, 8, 16).foreach { nprobe =>
      val t0 = System.nanoTime()
      val res = Similarity.annIvfNeighbors(emb, queries, k,
        nlist = 16, nprobe = nprobe)
      res.cache().count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (rec, hard, rows) = recallOf(res, "query_id", "neighbor_id")
      res.unpersist()
      out.println(s"""{"op":"ivf","nlist":16,"nprobe":$nprobe,""" +
        s""""wall_sec":$wall,"rows":$rows,"recall":$rec,"hard_recall":$hard}""")
      out.flush()
      System.err.println(
        s"[ann-recall] ivf nprobe=$nprobe recall=$rec hard=$hard wall=$wall")
    }

    // --- q119: SemDeDup, sweep nlist; recall here = fraction of planted
    // sibling PAIRS the within-cluster screen marks as duplicates ---
    val thr = 0.999 // replicas are 1e-3-nudged copies: cos ~ 0.999999
    Seq(4, 8, 16, 32).foreach { nlist =>
      val t0 = System.nanoTime()
      val res = Similarity.semDeDup(emb, thr, nlist = nlist)
      res.cache().count()
      val wall = (System.nanoTime() - t0) / 1e9
      // semDeDup returns (vec_id, list_id, is_kept): every non-base
      // replica should be dropped as a duplicate of a sibling — misses
      // are siblings split across clusters (the cost of small nlist is
      // pair volume, of large nlist cross-cluster misses)
      val dupCount = res.filter(!col("is_kept")).count()
      val expectedDups = emb.count() - emb.count() / nReplicas
      val rec = dupCount.toDouble / expectedDups
      res.unpersist()
      out.println(s"""{"op":"semdedup","nlist":$nlist,"threshold":$thr,""" +
        s""""wall_sec":$wall,"flagged":$dupCount,""" +
        s""""expected_dups":$expectedDups,"recall":$rec}""")
      out.flush()
      System.err.println(s"[ann-recall] semdedup nlist=$nlist recall=$rec wall=$wall")
    }
    out.close()
    spark.stop()
  }
}
