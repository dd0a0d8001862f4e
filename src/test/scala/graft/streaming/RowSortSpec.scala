package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class SortT(id: Int, k: String, rowtime: Timestamp)

/** The general-schema streaming sort must release rows in event-time
  * order as the watermark advances (the operator's whole contract —
  * the gate's multiset hash cannot see order) and collapse to the plain
  * ORDER BY in batch. */
class RowSortSpec extends SparkSpec {

  private def ts(m: Long) = new Timestamp(m * 60000L)

  test("streaming: out-of-order rows release in (rowtime, id) order") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SortT]
    val q = RowSort.sortByEventTime(input.toDF(), Seq("rowtime", "id"),
      delay = "5 minutes")
      .writeStream.format("memory").queryName("rowsort")
      .outputMode("append").start()
    input.addData(SortT(3, "c", ts(3)), SortT(1, "a", ts(1)))
    q.processAllAvailable()
    input.addData(SortT(2, "b", ts(2)), SortT(4, "d", ts(4)))
    q.processAllAvailable()
    // push the watermark far past everything, then drain via the timer
    input.addData(SortT(900, "z", ts(30))); q.processAllAvailable()
    input.addData(SortT(901, "z", ts(40))); q.processAllAvailable()
    q.stop()
    val emitted = spark.table("rowsort").as[SortT].collect()
      .filter(_.id < 100).map(_.id).toSeq
    assert(emitted == Seq(1, 2, 3, 4),
      s"rows must release in event-time order, got $emitted")
  }

  test("batch collapse equals the plain ORDER BY (non-timestamp keys ok)") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val got = RowSort.sortByEventTime(orders,
      Seq("o_totalprice", "o_orderkey")).collect().toSeq.map(_.toSeq)
    val want = orders.orderBy(col("o_totalprice"), col("o_orderkey"))
      .collect().toSeq.map(_.toSeq)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("contracts: streaming requires a leading timestamp; unknown and " +
    "non-comparable columns fail loudly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SortT]
    val e1 = intercept[IllegalArgumentException](
      RowSort.sortByEventTime(input.toDF(), Seq("id")))
    assert(e1.getMessage.contains("timestamp"))
    val df = Seq((1, "a")).toDF("a", "b").withColumn("arr", array(col("a")))
    val e2 = intercept[IllegalArgumentException](
      RowSort.sortByEventTime(df, Seq("arr")))
    assert(e2.getMessage.contains("non-comparable"))
    val e3 = intercept[IllegalArgumentException](
      RowSort.sortByEventTime(df, Seq("nope")))
    assert(e3.getMessage.contains("nope"))
  }
}
