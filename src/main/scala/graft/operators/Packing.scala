package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}

/** Sequence packing: assign documents, in id order, to fixed token-budget
  * packs (context windows) — the step between a curated corpus and a
  * training dataloader.
  *
  * Semantics: documents are laid out end-to-end in id order; a pack is one
  * `budget`-token stripe of that layout, and a document belongs to the
  * pack in which it STARTS. Equivalently `pack_id = prefix_sum_before(id)
  * div budget` — a pure function of the corpus, independent of
  * partitioning, so the same corpus always packs identically (and the
  * assignment is SQL-expressible, which is what the oracle checks). A
  * document longer than the budget still gets one pack id (its stripe of
  * origin); splitting oversized documents is the tokenizer's job, not the
  * packer's.
  *
  * The prefix sum is computed hierarchically, never globally sorted: ids
  * are bucketed by `id div bucketWidth`; each row's within-bucket
  * exclusive running sum comes from a window partitioned by bucket; the
  * per-bucket totals (a relation with |ids|/bucketWidth rows) get their
  * own exclusive running sum in one tiny single-partition window and are
  * broadcast back — a two-level carry-lookahead scan. The wide data
  * shuffles ONCE (on `bucket`): the bucket-totals aggregate reads the
  * window's exchange rather than re-shuffling (ReusedExchange,
  * plan-asserted in ScaleSpec), and the only single-partition stage
  * touches the bucket-total relation — choose bucketWidth so that stays
  * executor-sized (e.g. 1e6 ids per bucket → 1e5 totals for 1e11 ids).
  */
object Packing {

  def defs: Seq[QueryDef] = Seq(q58PackSequences, q106ChunkDocs)

  /** Adds `pack_id` to `df`: the `budget`-token stripe in which each row's
    * id-ordered token run begins. `tokenCol` must be non-negative
    * integral; `pack_bucket`/`pack_within`/`pack_offset` are reserved
    * working column names. */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, bucketWidth: Long = 1000000L): DataFrame = {
    require(budget > 0 && bucketWidth > 0)
    val rows = df.withColumn("pack_bucket",
      expr(s"cast(`$idCol` as bigint) div $bucketWidth"))
    // within-bucket exclusive running token sum (the one wide shuffle)
    val w = Window.partitionBy(col("pack_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = rows.withColumn("pack_within",
      coalesce(sum(col(tokenCol).cast(LongType)).over(w), lit(0L)))
    // bucket totals = last row's exclusive sum + its own tokens; computed
    // FROM cum so the aggregate's required hash(pack_bucket) distribution
    // is already satisfied by the window's exchange (reused, not repeated)
    val offsets = cum.groupBy(col("pack_bucket"))
      .agg(max(col("pack_within") + col(tokenCol).cast(LongType)).as("bucket_toks"))
      .withColumn("pack_offset",
        coalesce(sum(col("bucket_toks")).over(
          Window.orderBy(col("pack_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pack_bucket"), col("pack_offset"))
    cum.join(broadcast(offsets), Seq("pack_bucket"))
      .withColumn("pack_id", expr(s"(pack_offset + pack_within) div $budget"))
      .drop("pack_bucket", "pack_within", "pack_offset")
  }

  /** Pack the documents corpus into 400-token context windows and report
    * per-pack shape: the oracle restates the assignment as one global
    * window (fine at oracle scale; the engine side is the hierarchical
    * scan that survives at corpus scale). */
  val q58PackSequences: QueryDef = QueryDef("q58_pack_sequences",
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks,
      |    CAST(COALESCE(SUM(toks) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      // 400 AS pack_id
      |  FROM t)
      |SELECT pack_id, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS pack_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY pack_id ORDER BY pack_id""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), size(split(col("text"), " ", -1)).cast(LongType).as("toks"))
    packByTokenBudget(docs, "doc_id", "toks", budget = 400L, bucketWidth = 64L)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("pack_id"))
  }

  /** Split each document into overlapping token-budget chunks — the
    * inverse of packing, and the standard preprocessing for context
    * windows and retrieval corpora. Chunk `i` covers word positions
    * `[i·(budget−overlap), i·(budget−overlap)+budget)`; the final chunk
    * may be shorter; a document never emits a chunk that starts beyond
    * its length, and a short document emits exactly one chunk. Pure
    * per-row array algebra (sequence + slice inside the scan
    * projection) — the explode multiplies rows by ~n/stride but
    * introduces no shuffle, so the operator is embarrassingly parallel
    * at any corpus size. */
  def chunkByBudget(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", budget: Int = 32, overlap: Int = 8): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(overlap >= 0 && overlap < budget,
      s"overlap must be in [0, budget): $overlap")
    val stride = budget - overlap
    val base = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ", -1).as("words"))
      .withColumn("n", size(col("words")).cast(LongType))
      .withColumn("n_chunks",
        when(col("n") <= budget, lit(1L)).otherwise(
          ceil((col("n") - budget).cast(DoubleType) / stride).cast(LongType) + 1L))
    base
      .select(col("doc_id"), col("words"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .withColumn("start", col("chunk_id") * stride)
      .select(col("doc_id"), col("chunk_id"),
        size(slice(col("words"), (col("start") + 1L).cast(IntegerType), lit(budget)))
          .cast(LongType).as("n_chunk_tokens"),
        array_join(slice(col("words"), (col("start") + 1L).cast(IntegerType), lit(budget)), " ")
          .as("chunk_text"))
  }

  /** 32-token chunks with 8-token overlap over the documents corpus. The
    * oracle enumerates chunk ids up to the corpus-wide max(n_chunks) —
    * derived, not a constant, so a longer-than-expected document can
    * never silently truncate the oracle side. */
  val q106ChunkDocs: QueryDef = QueryDef("q106_chunk_docs",
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, ws, n,
      |    CASE WHEN n <= 32 THEN 1
      |         ELSE CAST(CEIL((n - 32) / 24.0) AS BIGINT) + 1 END AS n_chunks
      |  FROM w),
      |ids AS (
      |  SELECT unnest(range(0, (SELECT MAX(n_chunks) FROM c))) AS i),
      |e AS (
      |  SELECT doc_id, ws, i AS chunk_id, CAST(i * 24 AS BIGINT) AS start
      |  FROM c CROSS JOIN ids
      |  WHERE i < n_chunks)
      |SELECT doc_id, chunk_id,
      |  CAST(len(list_slice(ws, start + 1, start + 32)) AS BIGINT) AS n_chunk_tokens,
      |  array_to_string(list_slice(ws, start + 1, start + 32), ' ') AS chunk_text
      |FROM e ORDER BY doc_id, chunk_id""".stripMargin) { (spark, dir) =>
    chunkByBudget(Tables(spark, dir).documents, budget = 32, overlap = 8)
      .orderBy(col("doc_id"), col("chunk_id"))
  }
}
