package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.core.{QueryDef, Tables}

/** Async lookup (dimension) join — the reference's AsyncTableFunction
  * surface (AsyncLookupJoinRunner.java:53 + AsyncWaitOperator, ordered
  * mode): per-row point lookups into an external system with up to
  * `capacity` requests in flight per partition, results emitted in input
  * order.
  *
  * Spark-native shape: `mapPartitions` with a bounded in-flight queue —
  * the data plane stays fully distributed (every partition runs its own
  * lookup pipeline), and the concurrency cap bounds the pressure any one
  * executor puts on the external service, which is what the reference's
  * `capacity` option is for. The lookup callable runs on a per-partition
  * pool torn down via the task-completion listener, so failures/early
  * termination do not leak threads.
  *
  * This is the sanctioned `mapPartitions` case (an opaque external call,
  * not expressible as Catalyst expressions); for an in-cluster dimension
  * TABLE, a broadcast hash join (q05 pattern) is strictly better — this
  * operator exists for per-row RPC-style enrichment.
  */
object AsyncLookup {

  def defs: Seq[QueryDef] = Seq(q92AsyncLookup)

  /** Enrich each row of `ds` through `lookup`, running at most `capacity`
    * lookups concurrently per partition, emitting in input order. */
  def asyncLookupJoin[L, V, O: Encoder](ds: Dataset[L], lookup: L => V,
      capacity: Int, emit: (L, V) => O,
      timeout: Duration = Duration.Inf): Dataset[O] = {
    require(capacity > 0, s"lookup capacity must be positive, got $capacity")
    ds.mapPartitions { it =>
      val pool = Executors.newFixedThreadPool(capacity)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      new Iterator[O] {
        private val inflight =
          scala.collection.mutable.Queue.empty[(L, Future[V])]
        private var started = false
        // LAZY first fill: lookups are side-effecting external calls, so
        // none may fire until the consumer actually pulls (a downstream
        // limit/short-circuit that never consumes must not issue RPCs)
        private def ensure(): Unit =
          if (!started) { started = true; refill() }
        private def refill(): Unit = {
          while (inflight.size < capacity && it.hasNext) {
            val l = it.next()
            inflight.enqueue((l, Future(lookup(l))))
          }
          // input exhausted and nothing in flight: release the threads
          // even where no TaskContext listener exists (plain iterators)
          if (inflight.isEmpty) pool.shutdown()
        }
        def hasNext: Boolean = { ensure(); inflight.nonEmpty }
        def next(): O = {
          ensure()
          val (l, f) = inflight.dequeue()
          val v = Await.result(f, timeout)
          refill()
          emit(l, v)
        }
      }
    }
  }

  case class Supp(s_suppkey: Long, s_name: String, s_nationkey: Int)
  case class SuppNation(s_suppkey: Long, s_name: String, n_name: String)

  /** Async lookup join collapsed under the oracle: suppliers enriched
    * with their nation name through a point-lookup function (a captured
    * dim map standing in for the external service); the oracle is the
    * equivalent plain join. */
  val q92AsyncLookup: QueryDef = QueryDef("q92_async_lookup",
    """SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val dim: Map[Int, String] = t.nation
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val supp = t.supplier
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey")).as[Supp]
    asyncLookupJoin[Supp, String, SuppNation](
      supp, s => dim(s.s_nationkey), capacity = 8,
      (s, n) => SuppNation(s.s_suppkey, s.s_name, n))
      .toDF()
      .select(col("s_suppkey"), col("s_name"),
        col("n_name").cast(StringType).as("n_name"))
      .orderBy(col("s_suppkey"))
  }
}
