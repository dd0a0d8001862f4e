package graft.plans

import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
import org.apache.spark.sql.execution.joins._
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The opt-in transitive join-filter (qds72 week-set rewrite) must be
  * (1) off by default, (2) answer-preserving when on, (3) actually
  * inject the semi-join reduction on the qds72 shape, and (4) decline
  * the cases its gates exclude. */
class TransitiveSelfJoinFilterSpec extends SparkSpec {

  private def withFlag[T](on: Boolean)(f: => T): T = {
    spark.conf.set(TransitiveSelfJoinFilter.FLAG, on.toString)
    try f finally spark.conf.unset(TransitiveSelfJoinFilter.FLAG)
  }

  private def orders = spark.read.parquet(s"${sf()}/orders.parquet")
  private def lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")

  private def selfJoinQuery = {
    // the qds72 shape in miniature: d1 (static filter) and d2 (bare) are
    // the same dimension; the fact constrains d2 only transitively
    val a = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderdate").as("date_a"))
    val b = orders.select(col("o_orderkey").as("k"),
      col("o_orderdate").as("date_b"))
    lineitem.select(col("l_orderkey"), col("l_quantity"))
      .join(b, col("l_orderkey") === col("k"))
      .join(a, col("date_b") === col("date_a"))
  }

  private def semiJoins(df: org.apache.spark.sql.DataFrame): Int = {
    df.queryExecution.optimizedPlan.collect {
      case j: LJoin if j.joinType == LeftSemi => j
    }.size
  }

  test("off by default: no semi-join appears without the flag") {
    assert(semiJoins(selfJoinQuery) == 0)
  }

  test("flag on: injects semi-joins, chains to the fact, preserves the " +
      "answer") {
    val base = rows(selfJoinQuery.orderBy(col("l_orderkey"), col("date_a")))
    withFlag(on = true) {
      val df = selfJoinQuery
      // the reduction chains: d2-analogue (bare orders) is reduced by the
      // filtered instance, and the now-selective reduced slice reduces
      // the fact (lineitem) through the l_orderkey equality — the qds72
      // inventory chain in miniature
      assert(semiJoins(df) >= 2, df.queryExecution.optimizedPlan.toString)
      val factReduced = df.queryExecution.optimizedPlan.collect {
        case j: LJoin if j.joinType == LeftSemi &&
          j.left.collectLeaves().exists(_.toString.contains("l_orderkey")) => j
      }
      assert(factReduced.nonEmpty,
        "the chain must reach the fact table:\n" +
          df.queryExecution.optimizedPlan)
      val got = rows(df.orderBy(col("l_orderkey"), col("date_a")))
      assert(got == base)
      assert(got.nonEmpty)
    }
  }

  test("declines when the bare side already has a selective filter") {
    withFlag(on = true) {
      val a = orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderdate").as("date_a"))
      val b = orders.filter(col("o_orderpriority") === "2-HIGH")
        .select(col("o_orderdate").as("date_b"))
      val df = b.join(a, col("date_b") === col("date_a"))
      assert(semiJoins(df) == 0,
        "both sides filtered: the rewrite is redundant and must not fire")
    }
  }

  test("never copies an inner join into a build side") {
    withFlag(on = true) {
      // the "filtered" side is itself a join: the rule may legitimately
      // reduce OTHER equalities (it semi-joins lineitem by the filtered
      // orders inside `a`), but no injected build may ever contain a
      // copied inner join, and the date_a alias minted ABOVE the join
      // must not be treated as a slice
      val a = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderdate").as("date_a"))
      val b = orders.select(col("o_orderdate").as("date_b"))
      val df = b.join(a, col("date_b") === col("date_a"))
      val innerInBuilds = df.queryExecution.optimizedPlan.collect {
        case j: LJoin if j.joinType == LeftSemi =>
          j.right.collect {
            case i: LJoin if i.joinType != LeftSemi => i
          }
      }.flatten
      assert(innerInBuilds.isEmpty,
        s"a build side contains a copied non-semi join:\n" +
          df.queryExecution.optimizedPlan)
      // and the b side of the date equality stays unreduced (its would-be
      // source slice is join-bearing)
      val dateSemis = df.queryExecution.optimizedPlan.collect {
        case j: LJoin if j.joinType == LeftSemi &&
          j.condition.exists(_.references.exists(_.name == "date_b")) => j
      }
      assert(dateSemis.isEmpty,
        "date_b must not be reduced from a join-bearing slice")
    }
  }

  test("declines when a window sits between the join and the would-be " +
      "slice (b-side)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    withFlag(on = true) {
      val a = orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderdate").as("date_a"))
      // b: a window over a join-bearing subtree. The window subtree is
      // NOT slice-like (contains a real join), so a naive descent would
      // skip THROUGH the window and reduce its inputs — shifting
      // surviving rows' row_number. The descent must bail at the window.
      val b = lineitem.select(col("l_orderkey"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))))
        .select(col("o_orderdate").as("date_b"), col("rk"))
      val df = b.join(a, col("date_b") === col("date_a"))
      val semisBelowWindow = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.collect { case j: LJoin if j.joinType == LeftSemi => j }
      }.flatten
      assert(semisBelowWindow.isEmpty,
        "an injected reduction below a Window changes surviving rows' " +
          s"rank:\n${df.queryExecution.optimizedPlan}")
      val got = rows(df.orderBy(col("date_a"), col("rk")))
      val base = withFlag(on = false) {
        rows(b.join(a, col("date_b") === col("date_a"))
          .orderBy(col("date_a"), col("rk")))
      }
      assert(got == base)
    }
  }

  test("declines a >4-branch union-rooted a-side (build would cover one " +
      "branch, not a superset)") {
    withFlag(on = true) {
      // 5 leaves: the Union root is not slice-like, and Union output
      // reuses child-0 exprIds — a naive descent lands in branch 0 only,
      // so the build set would MISS branches 1..4's values and wrongly
      // drop matching b rows. The descent must bail at the Union.
      val branches = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW").map { p =>
        orders.filter(col("o_orderpriority") === p)
          .select(col("o_orderdate").as("date_a"))
      }
      val a = branches.reduce(_ union _)
      val b = orders.select(col("o_orderdate").as("date_b"))
      val df = b.join(a, col("date_b") === col("date_a"))
      assert(semiJoins(df) == 0,
        s"union-rooted a-side must decline:\n${df.queryExecution.optimizedPlan}")
      val got = rows(df.orderBy(col("date_a")))
      val base = withFlag(on = false) {
        rows(b.join(a, col("date_b") === col("date_a")).orderBy(col("date_a")))
      }
      assert(got == base)
    }
  }

  test("qds72_literal: answer unchanged and a reduction injected") {
    val name = "qds72_literal"
    val base = rows(graft.SparkEntry.queries(name)(spark, sf("sf0.01")))
    withFlag(on = true) {
      val df = graft.SparkEntry.queries(name)(spark, sf("sf0.01"))
      val semis = semiJoins(df)
      val got = rows(df)
      assert(got == base, "the rewrite changed qds72's answer")
      assert(semis >= 1,
        s"expected an injected LeftSemi reduction on qds72, got $semis")
    }
  }
}
