package graft.operators

import graft.SparkSpec

/** The TPC-DS composite queries must actually REUSE their shared CTE
  * subplans at execution (the reference's SubplanReuser.scala:53; Spark's
  * ReuseExchangeAndSequence runs inside AQE, so the check reads the
  * executed plan, not the static one): a triple-consumed INTERSECT CTE or
  * a twice-consumed aggregate that re-computes per consumer would triple
  * the dominant scan at 100 TB. */
class TpcDsCompositeSpec extends SparkSpec {

  private def reuseCount(name: String): Int = {
    val df = graft.SparkEntry.queries(name)(spark, sf())
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    "ReusedExchange".r.findAllIn(s).length + "ReusedSubquery".r.findAllIn(s).length
  }

  test("qds14 reuses the cross_items CTE and the avg_sales scalar across branches") {
    assert(reuseCount("qds14_cross_channel") >= 2,
      "expected ReusedExchange/ReusedSubquery for the triple-consumed CTEs")
  }

  test("qds23 reuses the cust_total aggregate between outer scan and MAX subquery") {
    assert(reuseCount("qds23_frequent_spenders") >= 1)
  }

  test("qds64 reuses the wide star CTE across the year-over-year self-join") {
    assert(reuseCount("qds64_yoy_selfjoin") >= 1,
      "the 5-table cs CTE must compute once, not once per self-join side")
  }

  test("qds57 reuses the monthly series CTE across its three consumers") {
    assert(reuseCount("qds57_seasonal_deviation") >= 1,
      "v1 is consumed three times (current/lag/lead) and must be reused")
  }

  test("qds88 shares the orders-customer build side across its eight slices") {
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    graft.SparkEntry.queries("qds88_quantity_slices")(spark, sf()).collect()
    val reused = executedPlanNodes("qds88_quantity_slices", sf())
      .count(_.isInstanceOf[ReusedExchangeExec])
    assert(reused >= 1,
      "the identical filtered orders⋈customer subtree must be built once, " +
        s"not once per slice (found $reused ReusedExchange nodes)")
  }

  test("qds95 reuses the multi-supplier self-join CTE across both IN consumers") {
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val reused = executedPlanNodes("qds95_multi_supplier", sf())
      .count(_.isInstanceOf[ReusedExchangeExec])
    assert(reused >= 1,
      s"li_ms is consumed twice and must compute once (found $reused)")
  }
}
