package graft.tools

/** Dev utility: print the executed physical plan of any declared query.
  * Usage: runMain graft.tools.Explain <query_name> [sfDir] [mode]
  * (mode = simple|formatted|extended). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = graft.core.SessionFactory.local("graft-explain", "8")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain(mode)
    spark.stop()
  }
}
