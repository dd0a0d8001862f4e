package graft.operators

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the Spark decimal semantics the literal-family oracles are built
  * on (round-7 directive #7): the qds18/49/61/90 hash-greens depend on
  * `TpcDsLiteral.duckAvgDec16_6` / `duckDivDec35_20` / the ratio-×100
  * rescale emulating EXACTLY what Spark computes — an exact decimal sum
  * HALF_UP-divided at the SQL result scale. A Spark version bump that
  * changes decimal division/avg typing or rounding must go red HERE,
  * naming the contract, before it surfaces as mysterious last-digit
  * drift in the driver's hash compare.
  *
  * Property-style: a deterministic value sweep (sign boundaries, halfway
  * rounding points, non-terminating rationals, 2^-17 tails that
  * terminate exactly at scale 21 — one past the result scale) checked
  * against an independent java.math.BigDecimal model of the documented
  * contracts. */
class DecimalParitySpec extends SparkSpec {

  /** Deterministic sweep of DECIMAL(12,2)-ish cents values: rounding
    * boundaries, signs, magnitudes, plus an LCG tail for breadth. */
  private val centsSweep: Seq[Long] = {
    val edges = Seq(0L, 1L, -1L, 49L, 50L, 51L, -50L, 99L, 100L, 101L,
      149L, 150L, 250L, -250L, 333L, 667L, 999999999L, -999999999L,
      123456789L, 1L, 3L, 7L)
    val lcg = Iterator.iterate(88172645463325252L)(x =>
      x * 6364136223846793005L + 1442695040888963407L)
      .map(x => (x % 100000000L).abs).take(40).toSeq
    edges ++ lcg
  }

  test("avg(DECIMAL(12,2)) is the exact sum HALF_UP-divided at scale 6 into DECIMAL(16,6)") {
    import spark.implicits._
    // groups of varying size, including counts (3, 7) that do not divide
    // the sum evenly — the HALF_UP-at-scale-6 behavior is the contract
    val rows = centsSweep.zipWithIndex.map { case (c, i) =>
      (i % 7, new JBD(c).movePointLeft(2))
    }
    val df = rows.toDF("g", "x")
      .select(col("g"), col("x").cast(DecimalType(12, 2)).as("x"))
      .groupBy(col("g")).agg(avg(col("x")).as("a"))
    assert(df.schema("a").dataType == DecimalType(16, 6),
      s"avg(DECIMAL(12,2)) must type as DECIMAL(16,6), got ${df.schema("a").dataType}")
    val got = df.collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      val sum = vs.map(_._2).reduce(_ add _)
      g -> sum.divide(new JBD(vs.size), 6, RoundingMode.HALF_UP)
    }
    expect.foreach { case (g, e) =>
      assert(got(g).compareTo(e) == 0,
        s"group $g: spark avg ${got(g)} != exact-sum HALF_UP model $e")
    }
  }

  test("DECIMAL(15,4)/DECIMAL(15,4) is exact-rational HALF_UP at scale 20 into DECIMAL(35,20)") {
    import spark.implicits._
    val numerators = centsSweep.map(c => new JBD(c).movePointLeft(4))
    // denominators include 2^17 = 131072: the quotient's decimal
    // expansion then terminates exactly at scale 21, one digit past the
    // result scale, with a trailing 5 — the precise halfway point where
    // HALF_UP vs truncate vs banker's rounding diverge
    val denominators = Seq("3", "7", "131072", "0.0001", "2.5", "-3",
      "99999999999.9999").map(new JBD(_))
    val pairs = for (n <- numerators; d <- denominators) yield (n, d)
    val df = pairs.map { case (n, d) => (n.toPlainString, d.toPlainString) }
      .toDF("n", "d")
      .select(col("n").cast(DecimalType(15, 4)).as("n"),
        col("d").cast(DecimalType(15, 4)).as("d"))
      .select(col("n"), col("d"), (col("n") / col("d")).as("q"))
    assert(df.schema("q").dataType == DecimalType(35, 20),
      s"DECIMAL(15,4)/DECIMAL(15,4) must type as DECIMAL(35,20), got ${df.schema("q").dataType}")
    df.collect().foreach { r =>
      val (n, d, q) = (r.getDecimal(0), r.getDecimal(1), r.getDecimal(2))
      val e = n.divide(d, 20, RoundingMode.HALF_UP)
      assert(q.compareTo(e) == 0,
        s"$n / $d: spark $q != exact-rational HALF_UP model $e")
    }
  }

  test("the ratio-times-100 shape rescales into DECIMAL(38,19) by one more HALF_UP") {
    import spark.implicits._
    // q61's shape: (DECIMAL(15,4)/DECIMAL(15,4)) * 100 overflows
    // precision 38 and Spark rescales the scale-20 quotient to scale 19
    val pairs = centsSweep.map(c =>
      (new JBD(c).movePointLeft(4).toPlainString, "131072"))
    val df = pairs.toDF("n", "d")
      .select(col("n").cast(DecimalType(15, 4)).as("n"),
        col("d").cast(DecimalType(15, 4)).as("d"))
      .select(col("n"), col("d"),
        (col("n") / col("d") * lit(100).cast(DecimalType(3, 0))).as("q"))
    assert(df.schema("q").dataType == DecimalType(38, 19),
      s"ratio*100 must type as DECIMAL(38,19), got ${df.schema("q").dataType}")
    df.collect().foreach { r =>
      val (n, d, q) = (r.getDecimal(0), r.getDecimal(1), r.getDecimal(2))
      val e = n.divide(d, 20, RoundingMode.HALF_UP)
        .multiply(new JBD(100)).setScale(19, RoundingMode.HALF_UP)
      assert(q.compareTo(e) == 0,
        s"($n / $d) * 100: spark $q != model $e")
    }
  }

  test("sum(DECIMAL(12,2)) stays an exact DECIMAL(22,2) - no double detour") {
    import spark.implicits._
    val rows = centsSweep.map(c => new JBD(c).movePointLeft(2))
    val df = rows.map(_.toPlainString).toDF("x")
      .select(col("x").cast(DecimalType(12, 2)).as("x"))
      .agg(sum(col("x")).as("s"))
    assert(df.schema("s").dataType == DecimalType(22, 2),
      s"sum(DECIMAL(12,2)) must type as DECIMAL(22,2), got ${df.schema("s").dataType}")
    val got = df.head().getDecimal(0)
    val expect = rows.reduce(_ add _).setScale(2)
    assert(got.compareTo(expect) == 0, s"spark sum $got != exact $expect")
  }
}
