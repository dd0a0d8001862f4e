package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must give pure-SQL sessions the native
  * functions with zero registration calls.
  *
  * Session handling: extensions apply only at builder-instantiation, and
  * `getOrCreate` would silently return the shared spec session (without
  * extensions) if one is registered as default — so the default is
  * cleared first and restored after. `spark.sql.extensions` is a STATIC
  * conf read from the SparkContext at its creation, which a test sharing
  * the suite JVM cannot influence, so the programmatic `withExtensions`
  * entry of the same injection path is used instead. The new session
  * shares the JVM's SparkContext and is NOT stopped (stopping it would
  * kill the context under every other suite). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects hash_code into a new session") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .appName("graft-ext-test")
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(ext => new GraftExtensions()(ext))
        .getOrCreate()
      val got = spark.sql("SELECT hash_code('spark') AS hc").head().getInt(0)
      assert(got == "spark".hashCode)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
      if (prevDefault.isEmpty && prevActive.isEmpty) {
        SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
      }
    }
  }
}
