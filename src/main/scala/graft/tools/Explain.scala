package graft.tools

/** Dev utility: print the executed physical plan of any declared query.
  * Usage: runMain graft.tools.Explain <query_name> [sfDir] [mode]
  * (mode = simple|formatted|extended, or `exec` to RUN the query and
  * print the AQE-final executed plan — the only way to see runtime
  * re-plans like skew splits and broadcast demotions). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = graft.core.SessionFactory.local("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (mode == "exec") {
      df.queryExecution.toRdd.count()
      // scalastyle:off println
      println(df.queryExecution.executedPlan.toString)
      // scalastyle:on println
    } else df.explain(mode)
    spark.stop()
  }
}
