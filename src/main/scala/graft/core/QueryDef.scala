package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named capability of the engine, exposed through the driver contract
  * (`SparkEntry.queries` / `SparkEntry.oracleSql`).
  *
  * @param name   stable query id (also the output parquet dir name)
  * @param run    Spark-side implementation; receives the SF directory
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None for non-SQL-expressible ops (the
  *               driver then records a weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  def rowsOnly(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}

/** Exact-arithmetic helpers for oracle parity.
  *
  * The fixtures store money as 2-decimal doubles. Summing doubles is
  * order-dependent (Spark's parallel partial aggregation vs DuckDB's
  * sequential scan would disagree in final ulps), so every aggregate the
  * correctness gate hashes is computed over exact decimals and only cast
  * back to double at the end: decimal addition is associative, hence
  * deterministic under any partitioning — the property that matters on a
  * 1000-executor cluster just as on local[32].
  */
object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** Cast a 2-decimal double column to an exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact `sum(x)` over a 2-decimal double column, returned as double. */
  def sumD(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact `avg(x)` as double: exact decimal sum divided by count. */
  def avgD(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(c)

  /** Exact revenue term `x * (1 - d)` in decimal: (18,2)*(19,2) → (38,4). */
  def mulOneMinus(x: Column, d: Column): Column =
    dec2(x) * (lit(1) - dec2(d))

  /** Exact charge term `x * (1 - d) * (1 + t)`: the first product is cast
    * to (24,4) so the second stays within both engines' 38-digit cap. */
  def mulOneMinusOnePlus(x: Column, d: Column, t: Column): Column =
    mulOneMinus(x, d).cast(DecimalType(24, 4)) * (lit(1) + dec2(t)).cast(DecimalType(10, 2))
}
