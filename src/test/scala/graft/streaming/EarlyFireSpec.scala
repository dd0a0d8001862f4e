package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.EarlyFire._
import graft.streaming.StatefulOps.Event

/** Emission-sequence spec for the early-fire windowed aggregate: partials
  * on the processing-time interval while the window is open, exactly one
  * final (`is_final = 1`) once the watermark closes it. */
class EarlyFireSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** Poll the memory sink until `cond` holds (proc-time timers fire on
    * their own micro-batch schedule, not on processAllAvailable). */
  private def await(cond: => Boolean, timeoutMs: Long = 20000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    cond
  }

  test("early-fire emits changed partials on the interval, then a final on close") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val query = earlyFireWindowAgg(input.toDS(),
      java.time.Duration.ofMinutes(5), earlyFire = "100 milliseconds")
      .writeStream.format("memory").queryName("efire")
      .outputMode("append").start()
    def fires(): Seq[WindowFire] = spark.table("efire").as[WindowFire]
      .collect().filter(_.user_id == 1).toSeq

    // NOTE: no processAllAvailable anywhere in this test — with a
    // processing-time timer re-armed every 100 ms the engine never
    // quiesces, so processAllAvailable can block indefinitely; the
    // continuously-running engine picks the data up on its own and the
    // sink is polled instead.
    // Two rows land in the [10:00, 10:05) window; watermark is still
    // behind the window end, so only PARTIALS may fire
    input.addData(Event(1, 101, ts(0), "view", 2.0), Event(1, 102, ts(1), "view", 3.0))
    assert(await(fires().nonEmpty), "no early fire within the timeout")
    val partials = fires()
    assert(partials.forall(_.is_final == 0),
      s"window is still open — nothing may be final yet: $partials")
    assert(partials.last.n_events == 2L && partials.last.sum_value == 5.0,
      s"partial must carry the current aggregate: $partials")

    // unchanged aggregate → the interval timer must NOT re-emit
    val countBefore = fires().size
    Thread.sleep(500)
    assert(fires().size == countBefore,
      "early fire re-emitted an unchanged partial")

    // advance the watermark past 10:05 → the next timer firing finalizes
    input.addData(Event(9, 900, ts(30), "view", 0.0))
    assert(await(fires().exists(_.is_final == 1)), "no final fire on close")
    query.stop()
    val all = fires()
    val finals = all.filter(_.is_final == 1)
    assert(finals.size == 1, s"exactly one final per window, got $all")
    assert(finals.head.n_events == 2L && finals.head.sum_value == 5.0)
    // the final is the LAST emission for the window
    assert(all.last.is_final == 1, s"emissions after the final: $all")
  }

  test("batch collapse emits exactly the final rows") {
    import spark.implicits._
    val events = Seq(
      Event(1, 101, ts(0), "view", 2.0),
      Event(1, 102, ts(1), "view", 3.0),
      Event(1, 103, ts(7), "view", 4.0),
      Event(2, 201, ts(1), "view", 1.0)).toDS()
    val out = earlyFireWindowAgg(events, java.time.Duration.ofMinutes(5))
      .collect().sortBy(f => (f.user_id, f.w_start_us))
    assert(out.forall(_.is_final == 1))
    assert(out.map(f => (f.user_id, f.n_events, f.sum_value)).toSeq ==
      Seq((1L, 2L, 5.0), (1L, 1L, 4.0), (2L, 1L, 1.0)))
  }
}
