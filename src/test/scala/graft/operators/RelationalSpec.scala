package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowGroupLimitExec

import graft.SparkSpec

/** Behavior + plan-shape specs for the relational core. Values are checked
  * by the DuckDB oracle gate; here we assert the *plans* — the part that
  * decides whether the same query survives a 100 TB cluster. */
class RelationalSpec extends SparkSpec {


  test("every declared query runs and returns rows at sf0.001") {
    // legitimately empty on the thousandth-scale fixture: q18's EXCEPT is
    // empty by construction, and the literal TPC-DS texts carry the
    // reference's own highly selective year+month+manager filters
    // (TpcDsLiteralSpec asserts they return rows at sf0.01, and the
    // DuckDB gate hash-matches them there)
    val emptyOk = Set("q18_except", "qds19_literal", "qds42_literal",
      "qds52_literal", "qds55_literal",
      // HAVING count(*) >= 10 over the thousandth-scale fixture
      "qds06_literal",
      // q8's zip INTERSECT needs > 10 preferred customers per zip;
      // sf0.001 has ~6 customers per address
      "qds08_literal",
      // q41's conjunctive (category, color, units, size) branches need a
      // sibling among ~2 items per manufacturer name at sf0.001
      // (simulated: 6 result items at sf0.01, 0 at sf0.001)
      "qds41_literal",
      // q69 needs a 1999-Q1 store buyer with NO web/catalog line in the
      // same window; q83 an item returned in all three channels in the
      // same weeks — both need more than ~150 customers / 6k lines
      "qds69_literal", "qds83_literal",
      // q58 needs one item sold in all three channels inside one week
      // (sanctioned-empty even at sf0.01 — see TpcDsLiteralSpec)
      "qds58_literal",
      // q91 needs a closed-month return from an M/unknown-education
      // buyer at a -6 GMT call center — non-empty from sf0.01 up
      "qds91_literal",
      // q14b self-joins this-year vs last-year best sellers on
      // (brand, class, category) — the intersection needs both years
      // populated for the same item triple; non-empty from sf0.01 up
      "qds14b_literal",
      // q71 needs a December sale landing in the breakfast/dinner
      // t_hour bands for a specific manager's brands — non-empty
      // from sf0.01 up (1 row)
      "qds71_literal",
      // q37 intersects a 60-day catalog-sales window with a ±2-price
      // band over the 5% of items in the spike — 2 rows at sf0.01,
      // none in the 200-part smoke fixture
      "qds37_literal",
      // q72 needs same-week inventory shortfall + 5-day-late shipping
      // + '1001-5000' buyers married 'M' — 6 rows at sf0.01, none at
      // sf0.001
      "qds72_literal",
      // sparser-than-fixture verbatim texts; both engines agree on the
      // empty (see TpcDsLiteralSpec emptyOk for per-query causes)
      "qds23b_literal", "qds34_literal", "qds54_literal", "qds85_literal",
      // q39 joins Jan-vs-Feb-1998 inventory months through date_dim,
      // which is built from DISTINCT order dates — the thousandth
      // fixture misses some 1998 Sundays, so the 4-snapshot groups
      // never form; 722/619 rows at sf0.01
      "qds39a_literal", "qds39b_literal",
      // q64 needs the same item returned at the same store in BOTH 1999
      // and 2000 after the color/price/margin filters — 2 rows at
      // sf0.01, none from the smoke fixture's ~3 eligible items
      "qds64_literal",
      // structurally empty on the driver fixtures: the verbatim texts
      // probe 1994 date windows and every fixture date is ≥ 1995-01-01
      // (see TpcHLiteralSpec); both engines agree on the empty result
      "tpch10_literal", "tpch12_literal")
    val empty = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val n = graft.SparkEntry.queries(name)(spark, sf()).count()
      if (n == 0 && !emptyOk(name)) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows: $empty")
  }

  test("entry flagship query returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q05 star join broadcasts the small dimensions") {
    val bhj = executedPlanNodes("q05_region_revenue", sf())
      .collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "expected broadcast hash joins for nation/region dims")
  }

  test("q25 top-n per group uses WindowGroupLimit pushdown") {
    val wgl = executedPlanNodes("q25_topn_per_group", sf())
      .collect { case w: WindowGroupLimitExec => w }
    assert(wgl.nonEmpty, "rank<=k filter should push into WindowGroupLimit")
  }

  test("filter pushdown reaches the parquet scan") {
    import org.apache.spark.sql.functions.col
    val df = graft.core.Catalog.load(spark, sf(), "lineitem")
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"scan missing pushed filter: $scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more columns than projected: $scan")
  }

  test("q01 aggregation is two-phase (partial before shuffle)") {
    val p = executedPlanNodes("q01_pricing_summary", sf())
    val aggs = p.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }
    assert(aggs.size >= 2, "expected partial+final HashAggregateExec pair")
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.nonEmpty)
  }
}
