package graft.operators

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec

/** Plan-shape specs for the TPC-H corpus (values are gated by the DuckDB
  * oracle): the decorrelation-stress queries must plan as equi-key joins —
  * a correlated subquery that degenerates to a cartesian/nested-loop plan
  * would "pass" at fixture scale and die at 100 TB. */
class TpcHSpec extends SparkSpec {

  private def assertNoCartesian(name: String): Unit = {
    val bad = executedPlanNodes(name, sf()).collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty,
      s"$name planned a cartesian/nested-loop join: ${bad.map(_.nodeName)}")
  }

  test("tpch21 double-correlated EXISTS/NOT EXISTS decorrelates to equi-key semi/anti joins") {
    val joinTypes = executedPlanNodes("tpch21_suppliers_waiting", sf()).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType.toString
    }
    assert(joinTypes.contains("LeftSemi"), s"expected a semi join, got $joinTypes")
    assert(joinTypes.contains("LeftAnti"), s"expected an anti join, got $joinTypes")
    assertNoCartesian("tpch21_suppliers_waiting")
  }

  test("tpch02 correlated min-cost subquery decorrelates (no cartesian)") {
    assertNoCartesian("tpch02_min_cost_supplier")
  }

  test("tpch20 three-level IN/scalar nest decorrelates (no cartesian)") {
    assertNoCartesian("tpch20_potential_promotion")
  }

  test("tpch06 pushes all three predicates into the parquet scan") {
    val scans = executedPlanNodes("tpch06_forecast_revenue", sf()).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"),
      s"expected shipdate/discount/quantity in PushedFilters, got: $pushed")
  }

  test("tpch13 left join keeps the priority filter in the join condition") {
    // 150 customers at sf0.001, every one retained by the LEFT join
    val total = graft.SparkEntry.queries("tpch13_customer_distribution")(spark, sf())
      .agg(org.apache.spark.sql.functions.sum("custdist")).collect()(0).getLong(0)
    assert(total == 150L, s"left join must retain all customers, got $total")
  }
}
