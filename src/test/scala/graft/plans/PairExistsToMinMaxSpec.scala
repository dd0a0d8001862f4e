package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Not}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join => LJoin}
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The opt-in pair-exists rewrite (qds95 multi-warehouse shape) must be
  * (1) off by default, (2) answer-preserving when on, replacing the
  * quadratic self-join with a min/max aggregate under semi AND anti
  * consumers, and (3) decline every case its gates exclude — different
  * inequality columns, non-identical sides, multiplicity-sensitive
  * consumers. */
class PairExistsToMinMaxSpec extends SparkSpec {

  private def withFlag[T](on: Boolean)(f: => T): T = {
    spark.conf.set(PairExistsToMinMax.FLAG, on.toString)
    try f finally spark.conf.unset(PairExistsToMinMax.FLAG)
  }

  private def orders = spark.read.parquet(s"${sf()}/orders.parquet")
  private def lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")

  // the qds95 ws_wh shape in miniature: orders whose lines used >= 2
  // distinct suppliers, probed by EXISTS
  private def ws = lineitem.select(col("l_orderkey").as("k"),
    col("l_suppkey").as("w"))
  private def pairKeys(neqRight: String = "w") = {
    val a = ws.as("a"); val b = ws.select(col("k").as("k2"),
      col("w").as("w2"), (col("w") + 1).as("v2"))
    a.join(b, col("a.k") === col("k2") &&
      col("a.w") =!= col(neqRight + "2")).select(col("a.k"))
  }
  private def semiProbe(keys: DataFrame, how: String = "left_semi") =
    orders.select(col("o_orderkey"), col("o_totalprice"))
      .join(keys, col("o_orderkey") === col("k"), how)

  private def pairJoins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: LJoin if j.joinType == Inner &&
        j.condition.exists(_.exists {
          case Not(_: EqualTo) => true
          case _ => false
        }) => j
    }.size
  private def minMaxAggs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.toString.contains("__graft_min_w")) => a
    }.size

  test("off by default: the quadratic pair join stays") {
    val df = semiProbe(pairKeys())
    assert(pairJoins(df) == 1 && minMaxAggs(df) == 0)
  }

  test("flag on: semi consumer gets the min/max aggregate, answer intact") {
    val base = rows(semiProbe(pairKeys()).orderBy(col("o_orderkey")))
    assert(base.nonEmpty)
    withFlag(on = true) {
      val df = semiProbe(pairKeys())
      assert(pairJoins(df) == 0 && minMaxAggs(df) == 1,
        df.queryExecution.optimizedPlan.toString)
      assert(rows(df.orderBy(col("o_orderkey"))) == base)
    }
  }

  test("flag on: anti consumer is rewritten too, answer intact") {
    val base = rows(semiProbe(pairKeys(), "left_anti").orderBy(col("o_orderkey")))
    assert(base.nonEmpty)
    withFlag(on = true) {
      val df = semiProbe(pairKeys(), "left_anti")
      assert(pairJoins(df) == 0 && minMaxAggs(df) == 1)
      assert(rows(df.orderBy(col("o_orderkey"))) == base)
    }
  }

  test("the qds95 SQL EXISTS shape rewrites and matches flag-off") {
    ws.createOrReplaceTempView("ws_view")
    orders.createOrReplaceTempView("ord_view")
    val q = """SELECT o.o_orderkey, o.o_totalprice
              |FROM ord_view o
              |WHERE EXISTS (
              |  SELECT * FROM (
              |    SELECT a.k FROM ws_view a, ws_view b
              |    WHERE a.k = b.k AND a.w <> b.w) ws_wh
              |  WHERE o.o_orderkey = ws_wh.k)
              |ORDER BY o.o_orderkey""".stripMargin
    val base = rows(spark.sql(q))
    assert(base.nonEmpty)
    withFlag(on = true) {
      val df = spark.sql(q)
      assert(minMaxAggs(df) == 1 && pairJoins(df) == 0,
        df.queryExecution.optimizedPlan.toString)
      assert(rows(df) == base)
    }
  }

  test("declines: inequality on a DIFFERENT column of the relation") {
    withFlag(on = true) {
      val df = semiProbe(pairKeys(neqRight = "v")) // a.w <> b.v
      assert(minMaxAggs(df) == 0)
    }
  }

  test("declines: sides are not the same relation") {
    withFlag(on = true) {
      val a = ws.as("a")
      val b = ws.filter(col("w") > 3)
        .select(col("k").as("k2"), col("w").as("w2"))
      val keys = a.join(b, col("a.k") === col("k2") &&
        col("a.w") =!= col("w2")).select(col("a.k"))
      val df = semiProbe(keys)
      assert(minMaxAggs(df) == 0, "asymmetric sides must not rewrite")
      assert(rows(df).nonEmpty)
    }
  }

  // --- direct-rule gate tests: hand-built catalyst plans, because the
  // optimizer itself strips/pushes the offending conjuncts before
  // extraOptimizations run in the normal pipeline (the advisory's point:
  // the rule ALSO fires on plans that did not take that path) ---

  import org.apache.spark.sql.catalyst.expressions.{And, IsNotNull, Rand, LessThan, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, JoinHint, LogicalPlan, Project => LProject}

  /** Semi probe over a hand-built pair join; `extraCond` mutates the pair
    * join's condition, `wrapRight` wraps the Project(k, pairJoin). */
  private def handBuiltSemi(extraCond: Option[LogicalPlan => org.apache.spark.sql.catalyst.expressions.Expression] = None,
      wrapRight: LogicalPlan => LogicalPlan = identity): LogicalPlan = {
    val ws3 = lineitem.select(col("l_orderkey").as("k"),
      col("l_suppkey").as("w"), col("l_quantity").as("v"))
    val left = ws3.queryExecution.analyzed
    val right = ws3.queryExecution.analyzed
    def a(p: LogicalPlan, n: String) = p.output.find(_.name == n).get
    val base = And(EqualTo(a(left, "k"), a(right, "k")),
      Not(EqualTo(a(left, "w"), a(right, "w"))))
    val cond = extraCond.fold[org.apache.spark.sql.catalyst.expressions.Expression](base)(
      f => And(base, f(left)))
    val pair = LJoin(left, right, Inner, Some(cond), JoinHint.NONE)
    val proj = LProject(Seq(a(left, "k")), pair)
    val ord = orders.select(col("o_orderkey")).queryExecution.analyzed
    LJoin(ord, wrapRight(proj), LeftSemi,
      Some(EqualTo(a(ord, "o_orderkey"), a(left, "k"))), JoinHint.NONE)
  }
  private def rewritten(p: LogicalPlan): Boolean =
    p.collect { case ag: Aggregate if ag.aggregateExpressions.exists(
      _.toString.contains("__graft_min_w")) => ag }.nonEmpty

  test("declines: isnotnull over a THIRD column in the join condition") {
    withFlag(on = true) {
      // control: the same hand-built shape without the extra conjunct DOES
      // rewrite — proves the flag is visible and isolates the gate
      assert(rewritten(PairExistsToMinMax(handBuiltSemi())))
      val withThird = handBuiltSemi(extraCond = Some(l =>
        IsNotNull(l.output.find(_.name == "v").get)))
      assert(!rewritten(PairExistsToMinMax(withThird)),
        "isnotnull over a non-key/ineq column is a real predicate; " +
          "dropping it would widen the key set")
      // isnotnull over the KEY columns stays redundant and still rewrites
      val withKeyNn = handBuiltSemi(extraCond = Some(l =>
        IsNotNull(l.output.find(_.name == "k").get)))
      assert(rewritten(PairExistsToMinMax(withKeyNn)))
    }
  }

  test("declines: nondeterministic filter over the pair output") {
    withFlag(on = true) {
      val nd = handBuiltSemi(wrapRight = proj =>
        LFilter(LessThan(new Rand(Literal(42L)), Literal(2.0)), proj))
      assert(!rewritten(PairExistsToMinMax(nd)),
        "deduplicating pairs under a nondeterministic filter changes the " +
          "sampled distribution — not set-equivalent")
      // a deterministic filter in the same position still rewrites
      val det = handBuiltSemi(wrapRight = proj =>
        LFilter(IsNotNull(proj.output.head), proj))
      assert(rewritten(PairExistsToMinMax(det)))
    }
  }

  test("declines: multiplicity-sensitive consumer (inner join / count)") {
    withFlag(on = true) {
      // the pair multiset feeds an inner join: multiplicities are
      // observable downstream, the SET rewrite would change the answer
      val df = semiProbe(pairKeys(), "inner")
      assert(minMaxAggs(df) == 0)
      val cnt = pairKeys().groupBy(col("k")).count()
      assert(minMaxAggs(cnt) == 0)
    }
  }
}
