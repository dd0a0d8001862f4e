package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local("graft-bench")
    // absorb session/codegen/reader init outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd executes the query's own physical plan; a plain count()
      // would let Catalyst prune the projected expressions and
      // under-measure function-heavy queries
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
