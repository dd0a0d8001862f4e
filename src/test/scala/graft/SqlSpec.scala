package graft

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The single SQL front door must execute embedded MATCH_RECOGNIZE
  * clauses through the general-schema executor and let the surrounding
  * statement compose over the result — including several clauses in one
  * statement — while leaving non-MR text (and string literals that
  * merely contain the keyword) to Spark SQL untouched. */
class SqlSpec extends SparkSpec {

  private def registerEvents(): Unit =
    graft.core.Catalog.load(spark, sf(), "events")
      .createOrReplaceTempView("events")

  test("embedded clause: MR result joined and aggregated by the " +
    "enclosing SQL equals the hand-composed DataFrame plan") {
    registerEvents()
    val got = graft.Sql.sql(spark,
      """SELECT m.user_id, m.view_id, m.purchase_id, u.n_events
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES A.event_id AS view_id, B.event_id AS purchase_id
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B)
        |  DEFINE A AS event_type = 'view',
        |         B AS event_type = 'purchase'
        |) AS m
        |JOIN (SELECT user_id, COUNT(*) AS n_events
        |      FROM events GROUP BY user_id) u
        |  ON m.user_id = u.user_id
        |ORDER BY m.user_id, m.view_id""".stripMargin)
    val mr = graft.streaming.MatchRecognizeSql.sqlDf(spark.table("events"),
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES A.event_id AS view_id, B.event_id AS purchase_id
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (A B)
        |  DEFINE A AS event_type = 'view',
        |         B AS event_type = 'purchase'
        |)""".stripMargin)
    val want = mr.join(
      spark.table("events").groupBy("user_id")
        .agg(count(lit(1)).as("n_events")), Seq("user_id"))
      .select("user_id", "view_id", "purchase_id", "n_events")
      .orderBy(col("user_id"), col("view_id"))
    assert(rows(got) == rows(want))
    assert(rows(got).nonEmpty)
  }

  test("two embedded clauses compose in one statement (union)") {
    registerEvents()
    val got = graft.Sql.sql(spark,
      """SELECT user_id, first_id FROM (
        |  SELECT user_id, view_id AS first_id FROM events MATCH_RECOGNIZE (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    MEASURES A.event_id AS view_id ONE ROW PER MATCH
        |    PATTERN (A B)
        |    DEFINE A AS event_type = 'view', B AS event_type = 'purchase')
        |  UNION ALL
        |  SELECT user_id, click_id AS first_id FROM events MATCH_RECOGNIZE (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    MEASURES C.event_id AS click_id ONE ROW PER MATCH
        |    PATTERN (C D)
        |    DEFINE C AS event_type = 'click', D AS event_type = 'purchase'))
        |ORDER BY user_id, first_id""".stripMargin)
    assert(rows(got).nonEmpty)
    // both clause executions registered distinct views
    assert(spark.catalog.tableExists("graft_mr_0"))
    assert(spark.catalog.tableExists("graft_mr_1"))
  }

  test("plain statements pass straight through; keyword inside a string " +
    "literal is not a clause") {
    registerEvents()
    val got = graft.Sql.sql(spark,
      "SELECT COUNT(*) AS n, 'not MATCH_RECOGNIZE (here)' AS s FROM events")
    assert(rows(got).head.head.asInstanceOf[Long] > 0)
  }

  test("malformed embedded clause fails loudly") {
    registerEvents()
    val e = intercept[Exception](graft.Sql.sql(spark,
      "SELECT * FROM events MATCH_RECOGNIZE (PARTITION BY user_id"))
    assert(e.getMessage.contains("unbalanced"))
    val e2 = intercept[Exception](graft.Sql.sql(spark,
      "SELECT * FROM 1 MATCH_RECOGNIZE (x)"))
    assert(e2.getMessage.contains("table reference"))
  }

  test("DML parity with the reference sqlUpdate surface: CREATE TABLE, " +
    "INSERT INTO (embedded MATCH_RECOGNIZE), DROP TABLE") {
    // reference: TableEnvironmentImpl.sqlUpdate accepts exactly
    // INSERT / CREATE TABLE / DROP TABLE (TableEnvironmentImpl.java:339);
    // the front door inherits all three from Spark SQL, and the splicer
    // works inside an INSERT's SELECT just as in a bare query
    registerEvents()
    val wh = java.nio.file.Files.createTempDirectory("graft_sqlspec")
    try {
      graft.Sql.sql(spark,
        s"""CREATE TABLE graft_pairs (user_id BIGINT, view_id BIGINT,
           |  purchase_id BIGINT) USING parquet
           |LOCATION '${wh.resolve("pairs")}'""".stripMargin)
      graft.Sql.sql(spark,
        """INSERT INTO graft_pairs
          |SELECT user_id, view_id, purchase_id
          |FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  MEASURES A.event_id AS view_id, B.event_id AS purchase_id
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (A B)
          |  DEFINE A AS event_type = 'view',
          |         B AS event_type = 'purchase'
          |)""".stripMargin)
      val inserted = spark.table("graft_pairs")
      val want = graft.streaming.MatchRecognizeSql.sqlDf(
        spark.table("events"),
        """SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts, event_id
          |  MEASURES A.event_id AS view_id, B.event_id AS purchase_id
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (A B)
          |  DEFINE A AS event_type = 'view',
          |         B AS event_type = 'purchase'
          |)""".stripMargin)
      assert(inserted.count() > 0)
      assert(rows(inserted.orderBy("user_id", "view_id")) ==
        rows(want.select("user_id", "view_id", "purchase_id")
          .orderBy("user_id", "view_id")))
      graft.Sql.sql(spark, "DROP TABLE graft_pairs")
      assert(!spark.catalog.tableExists("graft_pairs"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_pairs")
      org.apache.commons.io.FileUtils.deleteQuietly(wh.toFile)
    }
  }
}
