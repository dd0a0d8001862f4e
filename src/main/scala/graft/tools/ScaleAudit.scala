package graft.tools

import java.io.PrintWriter

/** Dev utility: execute every declared query against one scale-factor
  * directory and dump per-query plan-shape facts as JSON lines —
  * join-strategy counts, AQE skew/coalesce activity, spill bytes, wall
  * seconds, output rows. Diffing two dumps (scripts/scale_report.py) is
  * the SF1 soak: which plans change shape when the data grows 10×
  * (broadcast→SMJ flips, skew splits firing, spills appearing), the
  * behavior the reference's own harness exercises at scale factor 1
  * (reference: flink-table-planner-blink .../tpc/TpcDsBatchExecITCase.scala:44)
  * and fixture-scale runs can only assert by lint.
  *
  * Usage: runMain graft.tools.ScaleAudit <sfDir> <outFile> [prefix]
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outFile = args(1)
    val prefixes = (if (args.length > 2) args(2) else "").split(',').toSeq
    val spark = graft.core.SessionFactory.local("graft-scale-audit")
    graft.core.Catalog.assertFixtureSchemas(spark, dir)
    // same warmup discipline as Bench: session/codegen/reader init and the
    // one-time catalog ANALYZE stay outside every query's measured time
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.core.Catalog.load(spark, dir, "lineitem")
      .selectExpr("sum(l_quantity)").collect()
    graft.core.Catalog.registerAnalyzed(spark, dir)
    val out = new PrintWriter(outFile)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => prefixes.exists(q._1.startsWith)).foreach { case (name, fn) =>
        System.gc()
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, dir)
          // toRdd executes the query's own physical plan (a count() would
          // let Catalyst prune it); AQE finalizes during execution
          val rows = df.queryExecution.toRdd.count()
          val secs = (System.nanoTime() - t0) / 1e9
          val f = graft.core.PlanWalk.facts(df.queryExecution.executedPlan)
          out.println(s"""{"name":"$name","ok":true,"secs":$secs,"rows":$rows,${f.json}}""")
        } catch { case e: Throwable =>
          val msg = String.valueOf(e.getMessage).replaceAll("[\"\\\\\n\r\t]", " ")
            .take(200)
          out.println(s"""{"name":"$name","ok":false,"error":"${e.getClass.getSimpleName}: $msg"}""")
        }
        out.flush()
      }
    out.close()
    spark.stop()
  }
}
