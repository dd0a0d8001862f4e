package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract registry so documentation cannot drift from
  * the code: the README's declared-query count is parsed from the prose
  * and must equal `SparkEntry.queries.size` (round-7 verdict: the count
  * was pinned by hand and went stale the same day q119 landed). */
class SparkEntrySpec extends AnyFunSuite {

  test("README declared-query count matches the registry") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val m = """all (\d+), as of round""".r.findFirstMatchIn(text)
    assert(m.isDefined, "README must state 'all <N>, as of round <R>'")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README pins ${m.get.group(1)} declared queries but the registry " +
        s"has ${SparkEntry.queries.size} - update README.md")
  }

  test("every declared query has a unique name and an oracle") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    val noOracle = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"queries without an oracle (driver falls back to rows-only): $noOracle")
  }
}
