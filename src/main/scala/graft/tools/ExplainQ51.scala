import org.apache.spark.sql.SparkSession
object ExplainQ51 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SessionFactory.local("explain", "8")
    val df = graft.SparkEntry.queries("q51_cosine_near_dup")(spark, "/root/testdata/sf0.01")
    println(df.queryExecution.executedPlan.treeString.take(8000))
    spark.stop()
  }
}
