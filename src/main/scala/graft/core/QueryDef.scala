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

  /** Exact revenue term `x * (1 - d)` in decimal: (12,2)*(4,2) → (17,4).
    *
    * Precisions are deliberately tight: a product that stays ≤ 18 digits
    * keeps Spark's `Decimal` on its long-backed fast path (8-byte UnsafeRow
    * slot, cheap copies) instead of boxing a 16-byte BigDecimal per row —
    * the same long-vs-BigDecimal split the reference draws at 18 digits
    * (reference: flink-table-runtime-blink .../dataformat/Decimal.java:43,
    * SURVEY §1.2). The casts stay exact for any realistic money value
    * (per-row prices don't grow with scale factor): (12,2) holds up to
    * 9,999,999,999.99 and discounts/taxes are 2-decimal fractions < 10.
    * Exactness also means the DuckDB oracle needs no mirrored precisions —
    * both engines compute the identical rational value. */
  def mulOneMinus(x: Column, d: Column): Column =
    x.cast(DecimalType(12, 2)) * (lit(1) - d.cast(DecimalType(3, 2))).cast(DecimalType(4, 2))

  /** Exact charge term `x * (1 - d) * (1 + t)`: the first product is cast
    * down to (12,4) so the second product is (12,4)*(4,2) → (17,6), still
    * on the long-backed fast path. NOTE the tighter domain than
    * [[mulOneMinus]]: (12,4) holds 8 integer digits, so `x` must be
    * < 100,000,000.00 (fixture line amounts top out near 10^7; per-row
    * prices do not grow with scale factor). Exceeding it is a loud ANSI
    * overflow error, never silent corruption; widen to (14,4)*(4,2) —
    * (19,6), off the fast path — if a deployment ever needs larger
    * per-row amounts. */
  def mulOneMinusOnePlus(x: Column, d: Column, t: Column): Column =
    mulOneMinus(x, d).cast(DecimalType(12, 4)) * (lit(1) + t.cast(DecimalType(3, 2))).cast(DecimalType(4, 2))
}
