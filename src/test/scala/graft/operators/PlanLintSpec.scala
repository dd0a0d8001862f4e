package graft.operators

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec

/** Fleet-wide plan lint: NO declared query may execute a cartesian
  * product or nested-loop join — the plans that pass a fixture-scale gate
  * and then melt at 100 TB. Runs every entry in `SparkEntry.queries` and
  * inspects the AQE-finalized physical plan INCLUDING subquery plans
  * (a BNLJ inside a scalar subquery is just as scale-hostile). Whitelist:
  *
  *  - q10_cross_join: the cross join IS the declared operator;
  *  - q87_recursive_cte: the per-step scalar subquery joins against the
  *    recursion spine, which is ≤ 20 rows by construction — a nested
  *    loop over a bounded literal spine, not a data-scaled relation;
  *  - q57_tfidf, q107_temperature_mix: a 1-row global aggregate (corpus
  *    size / weight totals) joins onto a data-scaled relation as
  *    `crossJoin(broadcast(scalar))` — a BNLJ whose build side is
  *    exactly one row at any data scale. The broadcast scalar is the
  *    plan you want at 100 TB; the alternative (a window over an empty
  *    partition spec) funnels the relation through one partition;
  *  - qds88_quantity_slices / qds88_literal: the reference q88's own
  *    shape (composite and verbatim text) — eight cross-joined count(*)
  *    derived tables, every join side exactly one row at any data scale;
  *  - qds28_literal: same family — six cross-joined single-row
  *    aggregate buckets (the verbatim q28 text);
  *  - qds61_literal / qds90_literal: same family — the verbatim texts
  *    cross two single-row aggregate derived tables (promotional vs
  *    total sales; AM vs PM counts) to form a ratio;
  *  - qds77_literal: the verbatim q77 catalog arm is `from cs, cr` — a
  *    cross of two aggregates grouped by call-center key, so both
  *    sides are bounded by |call_center| (a fixed-size dimension) at
  *    any fact scale.
  */
class PlanLintSpec extends SparkSpec {

  private val whitelist =
    Set("q10_cross_join", "q87_recursive_cte", "q57_tfidf",
      "q107_temperature_mix", "qds88_quantity_slices", "qds88_literal",
      "qds28_literal", "qds61_literal", "qds77_literal", "qds90_literal")

  test("no declared query plans a cartesian or nested-loop join") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => whitelist(q._1))
      .flatMap { case (name, _) =>
        val bad = executedPlanNodes(name, sf()).collect {
          case _: CartesianProductExec => "CartesianProduct"
          case b: BroadcastNestedLoopJoinExec => s"BNLJ(${b.joinType})"
        }
        if (bad.nonEmpty) Some(s"$name -> ${bad.distinct.mkString(",")}") else None
      }
    assert(offenders.isEmpty,
      s"queries with scale-hostile join plans:\n${offenders.mkString("\n")}")
  }

  test("qds72's inventory join stays eligible for AQE skew splitting") {
    // The reference's own worst query (catalog_sales ⋈ inventory ⋈ dims on
    // a d1/d2/d3 week constraint) carries the widest un-broadcast join in
    // the corpus at scale; AQE must be able to split it if a week/item
    // key runs hot at 100×. OptimizeSkewedJoin only rewrites SMJ/SHJ
    // whose child shuffles carry shuffleOrigin == ENSURE_REQUIREMENTS — a
    // manual repartition() (REPARTITION_BY_COL/NUM) anywhere in the
    // pipeline would pin the partitioning and silently opt the join out.
    // Assert every shuffle is planner-inserted. (At fixture scale AQE
    // correctly demotes the joins to broadcast, so SMJ presence itself is
    // scale-dependent and not asserted; the eligibility property is.)
    import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}
    val nodes = executedPlanNodes("qds72_literal", sf("sf0.01"))
    val pinned = nodes.collect {
      case s: ShuffleExchangeExec if s.shuffleOrigin != ENSURE_REQUIREMENTS =>
        s.shuffleOrigin.toString
    }
    assert(pinned.isEmpty,
      s"qds72 contains user-pinned shuffles (AQE skew-split ineligible): $pinned")
  }
}
