package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §4.3 / the 100 TB design
  * brief): AQE's skew-join handling (on in SessionFactory) covers sort-
  * merge joins, but a hot key can still pin one task. Salting is the
  * manual fallback: the skewed (probe) side scatters each key across
  * `factor` salt buckets; the build side replicates each row into all
  * buckets; joining on (key, salt) spreads the hot key over `factor`
  * tasks. Results are identical to the unsalted join (spec-pinned). */
object SkewJoin {

  /** Inner equi-join of `skewed` and `small` on `key`, with the skewed
    * side salted `factor` ways. `small` is replicated ×factor — use only
    * when it is the (much) smaller side.
    *
    * REQUIRES a deterministic `skewed` input (file scans, shuffles of
    * deterministic plans): the salt derives from each row's physical
    * position, so a fetch-failure/stage-retry that *recomputes* rows in a
    * different order would re-salt them and could route rows to reducers
    * that already produced output — duplicating or dropping rows
    * (SPARK-23207 class). For a non-deterministic upstream (e.g. a prior
    * salted/sampled stage), pass `checkpoint = true`: the salted side is
    * localCheckpoint'ed so retries replay materialized rows instead of
    * recomputing salts. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      factor: Int, checkpoint: Boolean = false): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    // the internal salt column would silently shadow (and then drop) a
    // same-named user column — fail fast, as asOfJoin does for its tags
    require(!skewed.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves the column name _salt; rename the input column")
    val salted0 = skewed.withColumn("_salt", saltCol(factor))
    // lazy: materializes on first execution of the JOINED plan, not at
    // call time — an eager checkpoint would run a job (and cache every
    // column of the skewed side) before downstream pruning even applies
    val salted = if (checkpoint) salted0.localCheckpoint(eager = false) else salted0
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
      salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
      .drop(replicated(key))
  }

  /** The salt must vary across IDENTICAL duplicate rows — the canonical
    * hot-key case — so it cannot be a hash of row content. It derives from
    * the row's physical position (partition id + per-partition index),
    * which is stable under task retry for deterministic sources, hashed to
    * decorrelate from partition sizes. Any salt value yields a correct
    * join: the build side is replicated into every bucket. */
  private[graft] def saltCol(factor: Int): Column =
    pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
      lit(factor)).cast("int")
}
