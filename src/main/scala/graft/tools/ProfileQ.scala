package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev utility (r16 optimization): per-Spark-job time breakdown of any
  * declared query. The bench measures one wall-clock number per query;
  * queries that run MANY jobs internally (streaming replays, iterative
  * contraction, sentinel staging) need the job-level split to see where
  * the seconds go. Prints one line per job — start-relative offset,
  * duration, description/callsite — plus the wall time of the run()
  * call and the terminal action.
  *
  * Usage: runMain graft.tools.ProfileQ <query_name> [sfDir] [reps]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = graft.core.SessionFactory.local("graft-profile")
    // same warm-up + catalog setup as the bench, outside the profile
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()
    graft.core.Catalog.load(spark, dir, "lineitem")
      .selectExpr("sum(l_quantity)").collect()
    graft.core.Catalog.registerAnalyzed(spark, dir)

    case class Job(id: Int, start: Long, var end: Long, desc: String)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(e.jobId) = Job(e.jobId, e.time, -1L, desc)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { rep =>
      jobs.synchronized(jobs.clear())
      System.gc()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val tBuild = System.nanoTime()
      df.queryExecution.toRdd.count()
      val tEnd = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain job-end events
      // scalastyle:off println
      println(f"== rep $rep: build ${(tBuild - t0) / 1e9}%.3f s, " +
        f"action ${(tEnd - tBuild) / 1e9}%.3f s, " +
        f"total ${(tEnd - t0) / 1e9}%.3f s")
      val snap = jobs.synchronized(jobs.values.toList)
      val base = snap.headOption.map(_.start).getOrElse(0L)
      snap.foreach { j =>
        val dur = if (j.end < 0) -1.0 else (j.end - j.start) / 1e3
        println(f"  job ${j.id}%3d +${(j.start - base) / 1e3}%8.3f s " +
          f"${dur}%8.3f s  ${j.desc.take(110)}")
      }
      val covered = snap.filter(_.end > 0).map(j => j.end - j.start).sum / 1e3
      println(f"  sum(job durations) $covered%.3f s over ${snap.size} jobs " +
        "(gaps = driver-side planning/IO)")
      // scalastyle:on println
    }
    spark.stop()
  }
}
