package graft

import org.scalatest.funsuite.AnyFunSuite

/** The isolated-run protocol's pure plumbing: block selection must
  * partition the registry exactly (every query benched once, none twice)
  * and the child-JSON merge must round-trip what `resultJson` emits —
  * a silent drop here would under-report the bench without any failure. */
class BenchSpec extends AnyFunSuite {

  test("selected: no arg is the full registry, sorted") {
    assert(Bench.selected("") == SparkEntry.queries.keys.toSeq.sorted)
  }

  test("selected: --names= picks exactly the listed queries") {
    val all = SparkEntry.queries.keys.toSeq.sorted
    val pick = Seq(all.head, all.last)
    assert(Bench.selected(s"--names=${pick.mkString(",")}") == pick)
    // unknown names are dropped, not run into a KeyNotFound at bench time
    assert(Bench.selected("--names=no_such_query") == Seq.empty)
  }

  test("selected: bare arg filters by prefix") {
    val q1s = SparkEntry.queries.keys.toSeq.filter(_.startsWith("q1")).sorted
    assert(Bench.selected("q1") == q1s && q1s.nonEmpty)
  }

  test("parseQueries round-trips a bench JSON line, failures as -1.0") {
    val line = """{"metric":"total","value":3.5,"unit":"sec","queries":{"q01_a":1.25,"q02_b":-1.0,"q03_c":2.25},"failed":["q02_b"],"sf":"/x"}"""
    assert(Bench.parseQueries(line) ==
      Seq(("q01_a", 1.25), ("q02_b", -1.0), ("q03_c", 2.25)))
  }

  test("compactJson stays under the driver wrapper's 2000-char window " +
    "at full-registry size and reports total/failed/canaries") {
    // the wrapper keeps the LAST 2000 chars of bench output; the compact
    // trailer line must always fit inside it with room for sbt's epilogue
    val timed = SparkEntry.queries.keys.toSeq.sorted
      .map(n => (n, 1.5, true)) :+ ("q999_synthetic_failure", -1.0, false)
    val line = Bench.compactJson(timed, "/root/testdata/sf0.1",
      Some((0.9, 3.5)))
    assert(line.length < 1500, s"compact line too wide: ${line.length}")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""""queries":{}"""))
    assert(line.contains(""""failed":["q999_synthetic_failure"]"""))
    assert(line.contains(""""canary_st":0.900,"canary_mt":3.500"""))
    assert(line.contains(""""full":"scale/bench_full_sf0.1.json""""))
  }

  test("blocks of 16 partition the registry with no loss or overlap") {
    val all = Bench.selected("")
    val blocks = all.grouped(16).toSeq
    assert(blocks.flatten == all)
    assert(blocks.map(_.size).sum == SparkEntry.queries.size)
  }
}
