package graft.streaming

import graft.SparkSpec

/** The reference's `UNNEST` SQL spelling through the single front door:
  * rewrite contract plus reproductions of the old-planner
  * SqlITCase UNNEST IT cases (primitive array, object array with a
  * multi-column alias + filter, LEFT JOIN ... ON TRUE over a collected
  * array). */
class UnnestSqlSpec extends SparkSpec {

  private def rw(s: String) = UnnestSql.rewrite(s)

  test("rewrite: one-column alias (or none) routes to explode, " +
    "multi-column alias to inline; bare identifiers and string " +
    "literals pass through") {
    assert(rw("FROM T, UNNEST(T.b) AS A (s)") ==
      "FROM T, LATERAL explode(T.b) AS A (s)")
    assert(rw("FROM T, UNNEST(T.b) AS A (s, t)") ==
      "FROM T, LATERAL inline(T.b) AS A (s, t)")
    assert(rw("FROM T, UNNEST(T.b)") == "FROM T, LATERAL explode(T.b)")
    assert(rw("LEFT JOIN UNNEST(t2.st) AS A(s) ON TRUE") ==
      "LEFT JOIN LATERAL explode(t2.st) AS A(s) ON TRUE")
    val plain = "SELECT unnest FROM t"
    assert(rw(plain) == plain)
    val lit = "SELECT 'UNNEST(x)' AS s FROM t"
    assert(rw(lit) == lit)
  }

  test("reference stream SqlITCase.testUnnestPrimitiveArrayFromTable" +
    ":551-579 verbatim") {
    import spark.implicits._
    Seq((1, Array(12, 45)), (2, Array(41, 5)), (3, Array(18, 42)))
      .toDF("a", "b").createOrReplaceTempView("T")
    val got = graft.Sql.sql(spark,
      "SELECT a, b, s FROM T, UNNEST(T.b) AS A (s)")
    assert(rows(got.select("a", "s")).toSet == Set(
      Seq[Any](1, 12), Seq[Any](1, 45), Seq[Any](2, 41), Seq[Any](2, 5),
      Seq[Any](3, 18), Seq[Any](3, 42)))
  }

  test("reference stream SqlITCase.testUnnestObjectArrayFromTableWith" +
    "Filter:611-635 verbatim: multi-column alias expands the row type") {
    import spark.implicits._
    Seq((1, Array((12, "45.6"), (12, "45.612"))),
      (2, Array((13, "41.6"), (14, "45.2136"))),
      (3, Array((18, "42.6"))))
      .toDF("a", "b").createOrReplaceTempView("T")
    val got = graft.Sql.sql(spark,
      "SELECT a, b, s, t FROM T, UNNEST(T.b) AS A (s, t) WHERE s > 13")
    assert(rows(got.select("a", "s", "t")).toSet == Set(
      Seq[Any](2, 14, "45.2136"), Seq[Any](3, 18, "42.6")))
  }

  test("reference stream SqlITCase.testLeftUnnestMultiSetFromCollect" +
    "Result:668-705: LEFT JOIN UNNEST ... ON TRUE keeps empty-array " +
    "keys (COLLECT's graft twin is collect_list, minus its NULLs)") {
    import spark.implicits._
    Seq((1, "1", "Hello"), (1, "2", "Hello2"), (2, "2", "Hello"),
      (3, null.asInstanceOf[String], "Hello"), (4, "4", "Hello"),
      (5, "5", "Hello"), (5, null.asInstanceOf[String], "Hello"),
      (6, "6", "Hello"), (7, "7", "Hello World"), (7, "8", "Hello World"))
      .toDF("a", "b", "c").createOrReplaceTempView("t1")
    graft.Sql.sql(spark,
      "SELECT a, collect_list(b) AS st FROM t1 GROUP BY a")
      .createOrReplaceTempView("t2")
    val got = graft.Sql.sql(spark,
      "SELECT a, s FROM t2 LEFT JOIN UNNEST(t2.st) AS A(s) ON TRUE " +
        "WHERE a < 5")
    // the ITCase's expected rows (:700-705): key 3 has only a NULL
    // element — Flink's COLLECT keeps it as a multiset entry, Spark's
    // collect_list drops NULLs, so the LEFT side surfaces as (3, null)
    assert(rows(got).toSet == Set(
      Seq[Any](1, "1"), Seq[Any](1, "2"), Seq[Any](2, "2"),
      Seq[Any](3, null), Seq[Any](4, "4")))
  }

  test("q165's text path equals the DataFrame explode on the fixture") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    val sqlDf = graft.SparkEntry.queries("q165_sql_unnest")(spark, dir)
    val want = graft.core.Tables(spark, dir).embeddings
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), explode(col("embedding")).as("v"))
      .orderBy(col("vec_id"), col("v"))
    assert(rows(sqlDf) == rows(want))
    assert(rows(sqlDf).nonEmpty)
  }
}
