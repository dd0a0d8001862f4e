package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source/sink coverage (SURVEY.md §2.1): schema'd pipe-delimited CSV
  * (reference CsvTableSource2 — '|' fields, '\n' lines, explicit schema,
  * projection pushdown), parquet sink + partitioned layout with partition
  * pruning, values/LocalRelation source, and overwrite semantics
  * (reference OverwritableTableSink). */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("pipe-delimited CSV roundtrip with explicit schema") {
    val dir = tmp("graft_csv")
    val src = graft.core.Catalog.load(spark, sf(), "nation")
    src.write.mode("overwrite").option("delimiter", "|").csv(dir)
    val back = spark.read
      .schema(graft.core.Catalog.schemas("nation"))
      .option("delimiter", "|")
      .csv(dir)
    assert(rows(back.orderBy("n_nationkey")) == rows(src.orderBy("n_nationkey")))
  }

  test("CSV scan prunes columns (projection pushdown)") {
    val dir = tmp("graft_csv2")
    graft.core.Catalog.load(spark, sf(), "nation")
      .write.mode("overwrite").option("delimiter", "|").csv(dir)
    val df = spark.read.schema(graft.core.Catalog.schemas("nation"))
      .option("delimiter", "|").csv(dir)
      .select(col("n_name"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<n_name:string>"), scan)
  }

  test("partitioned parquet sink + partition pruning at the scan") {
    val dir = tmp("graft_part")
    graft.core.Catalog.load(spark, sf(), "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [isnotnull(status"), scan)
    // only the F partition directory is read
    val expected = graft.core.Catalog.load(spark, sf(), "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() == expected)
  }

  test("values source (LocalRelation) and overwrite sink mode") {
    import spark.implicits._
    val dir = tmp("graft_vals")
    val vals = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
    assert(vals.queryExecution.optimizedPlan.getClass.getSimpleName == "LocalRelation")
    vals.write.mode("overwrite").parquet(dir)
    Seq((9L, "z")).toDF("id", "tag").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(rows(back) == Seq(Seq(9L, "z")))
  }
}
