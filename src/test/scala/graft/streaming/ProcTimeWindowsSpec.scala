package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.OverAggregates.Agg

case class PtRow(k: String, v: Double, uid: Long, rowtime: Timestamp)

/** Proc-time TUMBLE group windows (r16 — the r15 tested rejection for
  * the TUMBLE assigner, now served): batch collapse equals the plain
  * GROUP BY; streaming assigns rows to the processing window of their
  * micro-batch and fires a window once the (injected) clock passes its
  * end, with exact widths and full row coverage. */
class ProcTimeWindowsSpec extends SparkSpec {

  private def mts(m: Long) = new Timestamp(m * 60000L)

  test("batch collapse: one processing instant = one window per key = " +
    "the plain GROUP BY, width column exact") {
    import spark.implicits._
    val df = Seq(
      PtRow("a", 1.0, 1L, mts(1)), PtRow("a", 2.5, 2L, mts(2)),
      PtRow("b", -3.0, 1L, mts(1)), PtRow("b", 4.0, 1L, mts(3))).toDF()
    val out = ProcTimeWindows.procTumbleAgg(df, Seq("k"),
      java.time.Duration.ofHours(1),
      Seq(Agg("COUNT", None, "n"), Agg("SUM", Some("v"), "s"),
        Agg("COUNT", Some("uid"), "nu", distinct = true)))
    val got = out.select("k", "w_width_ms", "n", "s", "nu")
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(got == Set(("a", 3600000L, 2L, 3.5, 2L),
      ("b", 3600000L, 2L, 1.0, 1L)), s"got $got")
    // one window per key: exactly one output row per key
    assert(out.groupBy("k").count().filter(col("count") =!= 1).count() == 0)
  }

  // proc-time timers never quiesce (the WindowAggAnySpec gotcha), so the
  // spec polls the sink with a deadline instead of processAllAvailable
  private def await(cond: => Boolean, timeoutMs: Long = 60000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    cond
  }

  test("streaming: rows join their micro-batch's processing window; a " +
    "key's window fires once the clock passes its end — exact widths, " +
    "aligned starts, held while open") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val widthMs = 60000L // 1-minute proc windows
    // injected clock: advanced between micro-batches by the test
    val clock = new java.util.concurrent.atomic.AtomicLong(10 * widthMs + 7)
    val input = MemoryStream[PtRow]
    val out = ProcTimeWindows.procTumbleAgg(input.toDF(), Seq("k"),
      java.time.Duration.ofMillis(widthMs),
      Seq(Agg("COUNT", None, "n"), Agg("SUM", Some("v"), "s")),
      nowMs = () => clock.get())
    val q = out.writeStream.format("memory").queryName("pttumble")
      .outputMode("append").start()
    def fired(): Long = spark.table("pttumble").count()
    // batch 1: two keys in window 10 — held (window open)
    input.addData(PtRow("a", 1.0, 1L, mts(1)), PtRow("a", 2.0, 2L, mts(2)),
      PtRow("b", 5.0, 1L, mts(1)))
    Thread.sleep(1500)
    assert(fired() == 0, "window 10 is still open — nothing may fire")
    // batch 2: clock into window 11 — window 10 fires for both keys,
    // the new rows accumulate into window 11
    clock.set(11 * widthMs + 3)
    input.addData(PtRow("a", 10.0, 3L, mts(3)), PtRow("b", 7.0, 2L, mts(4)))
    assert(await(fired() == 2), s"window-10 fires missing (${fired()})")
    // batch 3: clock into window 12 — window 11 fires for both keys;
    // these rows stay open in window 12 (never fired in this test)
    clock.set(12 * widthMs + 1)
    input.addData(PtRow("a", 2.0, 4L, mts(5)), PtRow("b", 3.0, 5L, mts(6)))
    assert(await(fired() == 4), s"window-11 fires missing (${fired()})")
    q.stop()
    val got = spark.table("pttumble")
      .select("k", "w_start_ms", "w_width_ms", "n", "s")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    val want = Set(
      ("a", 10 * widthMs, widthMs, 2L, 3.0),
      ("b", 10 * widthMs, widthMs, 1L, 5.0),
      ("a", 11 * widthMs, widthMs, 1L, 10.0),
      ("b", 11 * widthMs, widthMs, 1L, 7.0))
    assert(got == want, s"got $got")
    // structural invariants the oracle cannot see: aligned starts and
    // exact widths on every fired window
    assert(got.forall { case (_, w, wd, _, _) =>
      wd == widthMs && w % widthMs == 0 })
    // coverage: the 5 closed-window rows each landed in exactly one
    // fired window (the final 2 rows are still open in window 12)
    assert(got.toSeq.map(_._4).sum == 5L)
  }

  test("front door: GROUP BY TUMBLE(PROCTIME(), ...) routes to the " +
    "executor (batch collapse = GROUP BY); wall-clock auxiliaries and " +
    "non-grammar shapes fail loudly") {
    import spark.implicits._
    Seq(PtRow("a", 1.0, 1L, mts(1)), PtRow("a", 2.0, 2L, mts(2)),
      PtRow("b", 5.0, 1L, mts(1)))
      .toDF().createOrReplaceTempView("pt_src")
    val got = graft.Sql.sql(spark,
      """SELECT k, COUNT(*) AS n, SUM(v) AS s
        |FROM pt_src
        |GROUP BY TUMBLE(PROCTIME(), INTERVAL '1' HOUR), k""".stripMargin)
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("a", 2L, 3.0), ("b", 1L, 5.0)), s"got $got")
    val e = intercept[IllegalArgumentException](graft.Sql.sql(spark,
      """SELECT k, TUMBLE_START(PROCTIME(), INTERVAL '1' HOUR) AS ws,
        |  COUNT(*) AS n
        |FROM pt_src
        |GROUP BY TUMBLE(PROCTIME(), INTERVAL '1' HOUR), k""".stripMargin))
    assert(e.getMessage.contains("wall clock"), e.getMessage)
    // HOP/SESSION over proc-time stay tested rejections (rewrite path)
    val e2 = intercept[IllegalArgumentException](graft.Sql.sql(spark,
      "SELECT COUNT(*) AS n FROM pt_src GROUP BY HOP(PROCTIME(), " +
        "INTERVAL '30' MINUTE, INTERVAL '1' HOUR)"))
    assert(e2.getMessage.contains("proc-time group windows"), e2.getMessage)
  }
}
