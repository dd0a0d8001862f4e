package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The literal family's claim is that the reference's own query texts run
  * unmodified — so pin each shipped body against the reference file on
  * disk: strip the template comment banners, collapse whitespace, and the
  * strings must be identical. A drive-by "fix" to a literal text fails
  * here, not in a silent semantic drift. */
class TpcDsLiteralSpec extends SparkSpec {

  private val refDir = Paths.get(
    "/root/reference/flink-table/flink-table-planner-blink/src/test/resources/tpcds/queries/1")

  private def norm(sql: String): String =
    sql.linesIterator
      .filterNot(_.trim.startsWith("--"))
      .mkString(" ")
      .replaceAll("\\s+", " ")
      .trim.toLowerCase

  test("shipped literal texts equal the reference query files") {
    assume(Files.isDirectory(refDir), "reference tree not present")
    TpcDsLiteral.texts.foreach { case (stem, body) =>
      val ref = new String(Files.readAllBytes(refDir.resolve(s"$stem.sql")))
      assert(norm(body) == norm(ref),
        s"$stem.sql drifted from the reference text")
    }
  }

  test("every literal query returns rows through the view adapter") {
    // qds58 is sanctioned-empty at sf0.01: its join needs one item sold
    // in ALL THREE channels inside one calendar week, and the hundredth
    // fixture has ~0.2 lines per (item, week) — both engines agree on
    // the empty result and the driver row is a hash match
    val emptyOk = Set("qds58_literal")
    TpcDsLiteral.defs.filterNot(d => emptyOk(d.name)).foreach { d =>
      val n = d.run(spark, sf("sf0.01")).count()
      assert(n > 0, s"${d.name} returned no rows at sf0.01")
    }
  }
}
