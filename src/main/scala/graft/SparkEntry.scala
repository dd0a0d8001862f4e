package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented capability is a [[graft.core.QueryDef]] contributed by
  * an operator module; this object only concatenates them into the
  * `queries` / `oracleSql` maps the driver consumes.
  */
object SparkEntry {

  /** All declared capabilities, one QueryDef per SURVEY.md §2 operator. */
  def all: Seq[QueryDef] =
    graft.operators.Relational.defs ++
      graft.operators.TpcH.defs ++
      graft.operators.TpcHLiteral.defs ++
      graft.operators.TpcDsComposites.defs ++
      graft.operators.TpcDsLiteral.defs ++
      graft.operators.FunctionSurface.defs ++
      graft.operators.TextAnalysis.defs ++
      graft.operators.Corpus.defs ++
      graft.operators.Scrub.defs ++
      graft.operators.Sampling.defs ++
      graft.operators.Packing.defs ++
      graft.operators.Dedup.defs ++
      graft.operators.Similarity.defs ++
      graft.operators.Windows.defs ++
      graft.operators.Multimodal.defs ++
      graft.operators.AsOfJoin.defs ++
      graft.operators.AsyncLookup.defs ++
      graft.operators.Aggregates.defs ++
      graft.operators.Analytics.defs ++
      graft.streaming.StatefulBatch.defs ++
      graft.operators.Funnel.defs ++
      graft.operators.MatchSql.defs ++
      graft.operators.OverSql.defs ++
      graft.operators.RankDedupSql.defs ++
      graft.operators.Sketches.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Relational.q01PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
