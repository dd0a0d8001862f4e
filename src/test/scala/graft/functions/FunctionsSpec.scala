package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the gap scalar functions: SQL-name registration, codegen'd
  * HASH_CODE parity with Java String.hashCode, and null/edge semantics
  * (reference SqlFunctionUtils.java behaviors). */
class FunctionsSpec extends SparkSpec {

  test("registered SQL names evaluate like the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT split_index('a,b,c', ',', 1) AS si,
        |  split_index('a,b,c', ',', 9) AS si_oob,
        |  keyvalue('k1=v1&k2=v2', '&', '=', 'k2') AS kv,
        |  is_decimal('-12.5') AS d1, is_decimal('x5') AS d2,
        |  is_digit('0042') AS g1, is_digit('4 2') AS g2,
        |  is_alpha('Spark') AS a1, is_alpha('Spark4') AS a2,
        |  hash_code('spark') AS hc""".stripMargin).head()
    assert(r.getString(0) == "b")
    assert(r.isNullAt(1))
    assert(r.getString(2) == "v2")
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getBoolean(5) && !r.getBoolean(6))
    assert(r.getBoolean(7) && !r.getBoolean(8))
    assert(r.getInt(9) == "spark".hashCode)
  }

  test("JavaHashCode expression matches JVM hashCode on fixture text") {
    import spark.implicits._
    val docs = graft.core.Catalog.load(spark, sf(), "documents")
      .select(col("text"), GraftFunctions.hashCode(col("text")).as("hc"))
      .as[(String, Int)].collect()
    assert(docs.nonEmpty)
    docs.foreach { case (text, hc) => assert(hc == text.hashCode) }
  }

  test("JavaHashCode rejects non-string input at analysis time") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("x")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(GraftFunctions.hashCode(col("x"))).collect()
    }
  }

  test("splitIndex quotes regex metacharacters in the separator") {
    import spark.implicits._
    val r = Seq("a|b|c").toDF("s")
      .select(GraftFunctions.splitIndex(col("s"), "|", 1)).head().getString(0)
    assert(r == "b")
  }
}
