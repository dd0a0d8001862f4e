package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Pin the 7 TPC-H literal texts against the reference query files on
  * disk (same discipline as [[TpcDsLiteralSpec]]): strip comments,
  * collapse whitespace, and the strings must be identical — modulo the
  * single adapter normalization, the Calcite-only `day (3)` interval
  * precision token, which neither executing engine parses. */
class TpcHLiteralSpec extends SparkSpec {

  private val refDir = Paths.get(
    "/root/reference/flink-table/flink-table-planner-blink/src/test/resources/tpch/queries")

  private val stems = Map(
    "01" -> TpcHLiteral.Q01, "03" -> TpcHLiteral.Q03,
    "05" -> TpcHLiteral.Q05, "10" -> TpcHLiteral.Q10,
    "12" -> TpcHLiteral.Q12, "17" -> TpcHLiteral.Q17,
    "18" -> TpcHLiteral.Q18)

  private def norm(sql: String): String =
    sql.linesIterator
      .filterNot(_.trim.startsWith("--"))
      .mkString(" ")
      .replaceAll("day \\(3\\)", "day")
      .replaceAll("\\s+", " ")
      .trim.toLowerCase

  test("shipped TPC-H literal texts equal the reference query files") {
    assume(Files.isDirectory(refDir), "reference tree not present")
    stems.foreach { case (stem, body) =>
      val ref = new String(Files.readAllBytes(refDir.resolve(s"$stem.sql")))
      assert(norm(body) == norm(ref),
        s"$stem.sql drifted from the reference text")
    }
  }

  test("renameTables never rewrites inside quoted string literals") {
    // a constant like '%orders%' must survive the oracle's table rename
    // verbatim, or the oracle queries a different value than Spark
    val body = "select o_orderkey from orders " +
      "where o_comment like '%orders%' and o_clerk <> 'customer lineitem' " +
      "and exists (select 1 from lineitem where l_orderkey = o_orderkey)"
    val renamed = TpcHLiteral.renameTables(body)
    assert(renamed.contains("from orders_v"))
    assert(renamed.contains("from lineitem_v"))
    assert(renamed.contains("'%orders%'"), s"literal corrupted: $renamed")
    assert(renamed.contains("'customer lineitem'"), s"literal corrupted: $renamed")
    // and the quoted segments are bytewise unchanged as a set
    def quotes(s: String) =
      "'[^']*'".r.findAllIn(s).toSeq
    assert(quotes(body) == quotes(renamed))
    // the 7 shipped texts keep their literal sets through the rewrite too
    stems.values.foreach { b =>
      assert(quotes(b) == quotes(TpcHLiteral.renameTables(b)))
    }
  }

  test("non-structurally-empty TPC-H literals return rows at sf0.001") {
    // q10 (1994 order window) and q12 (1994 receipt window) are
    // structurally empty: every fixture order/ship date is ≥ 1995-01-01,
    // and the synthesized receipt date is never before its ship date.
    // Both engines agree on the empty result.
    val emptyOk = Set("tpch10_literal", "tpch12_literal")
    TpcHLiteral.defs.filterNot(d => emptyOk(d.name)).foreach { d =>
      val n = d.run(spark, sf("sf0.001")).count()
      assert(n > 0, s"${d.name} returned no rows at sf0.001")
    }
  }
}
