package graft.streaming

import graft.SparkSpec
import graft.operators.{Funnel, MatchSql}

/** The SQL MATCH_RECOGNIZE front-end must be a faithful rewriter: every
  * SQL-shape query returns bit-identical rows to the Scala-API twin it
  * rewrites onto, and unsupported grammar fails loudly at parse time. */
class MatchRecognizeSqlSpec extends SparkSpec {

  private def events = StatefulOps.typedEvents(spark, sf())

  test("SQL shapes are row-identical to their Scala-API twins") {
    val pairs = Seq(
      MatchSql.q125SqlFunnel -> Funnel.q89MatchRecognize,
      MatchSql.q126SqlPrev -> Funnel.q96PrevDefine,
      MatchSql.q127SqlReluctant -> Funnel.q98ReluctantMatch,
      MatchSql.q128SqlNext -> Funnel.q99NextDefine,
      MatchSql.q129SqlSkipNext -> Funnel.q111SkipToNextRow,
      MatchSql.q130SqlAllRows -> Funnel.q113AllRows)
    pairs.foreach { case (sqlDef, apiDef) =>
      val got = rows(sqlDef.run(spark, sf()))
      val want = rows(apiDef.run(spark, sf()))
      assert(got == want, s"${sqlDef.name} != ${apiDef.name}")
      assert(got.nonEmpty, s"${sqlDef.name} returned no rows")
    }
  }

  test("SQL and API twins share the same column names") {
    assert(MatchSql.q125SqlFunnel.run(spark, sf()).columns.toSeq ==
      Funnel.q89MatchRecognize.run(spark, sf()).columns.toSeq)
  }

  test("WITHIN bounds a match's event-time span from its first row") {
    // fixture sessions span days; a tight WITHIN must prune matches
    val all = MatchRecognizeSql.sql(events,
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES A.event_id AS view_id, C.event_id AS purchase_id
        |  ONE ROW PER MATCH
        |  PATTERN (A B+ C)
        |  DEFINE A AS event_type = 'view', B AS event_type = 'click',
        |         C AS event_type = 'purchase'
        |)""".stripMargin).count()
    val tight = MatchRecognizeSql.sql(events,
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES A.event_id AS view_id, C.event_id AS purchase_id
        |  ONE ROW PER MATCH
        |  PATTERN (A B+ C) WITHIN INTERVAL '1' SECOND
        |  DEFINE A AS event_type = 'view', B AS event_type = 'click',
        |         C AS event_type = 'purchase'
        |)""".stripMargin).count()
    assert(tight < all, s"WITHIN '1' SECOND must prune ($tight vs $all)")
  }

  test("SKIP TO FIRST/LAST variable parses and runs") {
    val df = MatchRecognizeSql.sql(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES FIRST(B.event_id) AS first_click, C.event_id AS p_id
        |  AFTER MATCH SKIP TO LAST B
        |  PATTERN (A B+ C)
        |  DEFINE A AS event_type = 'view', B AS event_type = 'click',
        |         C AS event_type = 'purchase'
        |)""".stripMargin)
    assert(df.columns.toSeq == Seq("user_id", "first_click", "p_id"))
    df.collect()
  }

  test("unsupported grammar fails loudly at parse time") {
    def bad(sql: String, fragment: String): Unit = {
      val e = intercept[Exception](MatchRecognizeSql.sql(events, sql))
      assert(e.getMessage.contains(fragment),
        s"error '${e.getMessage}' should mention '$fragment'")
    }
    // cross-variable DEFINE reference
    bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
          |PATTERN (A B) DEFINE B AS A.value < value)""".stripMargin,
      "cross-variable")
    // PREV offset beyond 1
    bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
          |PATTERN (A) DEFINE A AS value < PREV(value, 2))""".stripMargin,
      "offset 1")
    // unknown field
    bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
          |PATTERN (A) DEFINE A AS price > 5)""".stripMargin,
      "unknown field")
    // wrong partition key
    bad("""MATCH_RECOGNIZE (PARTITION BY event_type ORDER BY ts
          |PATTERN (A))""".stripMargin,
      "PARTITION BY must be user_id")
    // MEASURES in ALL ROWS mode
    bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
          |MEASURES A.event_id AS x ALL ROWS PER MATCH
          |PATTERN (A))""".stripMargin,
      "canonical projection")
    // DEFINE of a variable the PATTERN does not name
    bad("""MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
          |PATTERN (A) DEFINE Z AS value > 0)""".stripMargin,
      "not a PATTERN variable")
  }

  test("string escapes and numeric literals in DEFINE evaluate correctly") {
    val df = MatchRecognizeSql.sql(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES A.event_id AS eid, A.value AS v
        |  PATTERN (A)
        |  DEFINE A AS event_type <> 'view' AND value >= 50.0
        |)""".stripMargin)
    val got = df.collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getDouble(2) >= 50.0))
  }
}
