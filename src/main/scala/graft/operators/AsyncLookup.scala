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

  /** A per-partition store connection — the reference's
    * AsyncLookupFunction lifecycle (RichAsyncFunction.open/close around
    * per-row `asyncInvoke`, AsyncLookupJoinRunner.java:53): opened
    * lazily INSIDE the partition on first pull, point-fetched under the
    * in-flight cap, closed with the task. Nothing touches the driver. */
  trait StoreClient[K, V] extends java.io.Closeable {
    def fetch(key: K): V
  }

  /** Async lookup join against a per-partition store connection: each
    * partition opens its own client (no driver materialization of the
    * dimension — the reference's runner holds a connection, not a
    * collected table), runs at most `capacity` fetches concurrently, and
    * emits in input order. `openClient` must be a serializable closure;
    * it runs once per partition. */
  def asyncLookupJoinStore[L, K, V, O: Encoder](ds: Dataset[L],
      openClient: () => StoreClient[K, V], key: L => K, capacity: Int,
      emit: (L, V) => O, timeout: Duration = Duration.Inf): Dataset[O] = {
    require(capacity > 0, s"lookup capacity must be positive, got $capacity")
    ds.mapPartitions { it =>
      // both the client and the pool open lazily on first pull — a
      // downstream limit that never consumes must neither connect nor
      // issue fetches
      var client: StoreClient[K, V] = null
      var pool: java.util.concurrent.ExecutorService = null
      var ec: ExecutionContext = null
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          if (pool != null) pool.shutdownNow()
          if (client != null) client.close()
        })
      new Iterator[O] {
        private val inflight =
          scala.collection.mutable.Queue.empty[(L, Future[V])]
        private var started = false
        private def ensure(): Unit =
          if (!started) {
            started = true
            client = openClient()
            pool = Executors.newFixedThreadPool(capacity)
            ec = ExecutionContext.fromExecutor(pool)
            refill()
          }
        private def refill(): Unit = {
          while (inflight.size < capacity && it.hasNext) {
            val l = it.next()
            inflight.enqueue((l, Future(client.fetch(key(l)))(ec)))
          }
          if (inflight.isEmpty && pool != null) {
            // null out after closing so the task-completion listener
            // (and a re-entrant refill) never double-closes — a real RPC
            // client's close() need not be idempotent (ADVICE r14)
            pool.shutdown(); client.close()
            pool = null; client = null
          }
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

  /** A [[StoreClient]] over a parquet key/value table read DIRECTLY from
    * storage by the partition that opens it (parquet-hadoop reader — no
    * SparkSession, no driver collect): the executor-side analogue of a
    * dimension-store connection whose open() loads/caches its working
    * set. A real deployment swaps this class for its RPC client; the
    * async pipeline above is unchanged. */
  final class ParquetKvStoreClient(path: String, keyCol: String,
      valCol: String) extends StoreClient[Int, String] {
    private val kv: Map[Int, String] = {
      import org.apache.hadoop.fs.Path
      val conf = new org.apache.hadoop.conf.Configuration()
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(_.getName.endsWith(".parquet")).toSeq
        else Seq(p)
      val b = Map.newBuilder[Int, String]
      files.foreach { f =>
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), f)
          .withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            b += g.getInteger(keyCol, 0) -> g.getString(valCol, 0)
            g = reader.read()
          }
        } finally reader.close()
      }
      b.result()
    }
    override def fetch(k: Int): String = kv(k)
    override def close(): Unit = ()
  }

  case class Supp(s_suppkey: Long, s_name: String, s_nationkey: Int)
  case class SuppNation(s_suppkey: Long, s_name: String, n_name: String)

  /** Async lookup join collapsed under the oracle: suppliers enriched
    * with their nation name through per-partition point lookups into a
    * store client that each partition OPENS ITSELF (r14 — previously a
    * driver-collected map); the oracle is the equivalent plain join. */
  val q92AsyncLookup: QueryDef = QueryDef("q92_async_lookup",
    """SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val dimPath = s"$dir/nation.parquet"
    val supp = t.supplier
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey")).as[Supp]
    asyncLookupJoinStore[Supp, Int, String, SuppNation](
      supp, () => new ParquetKvStoreClient(dimPath, "n_nationkey", "n_name"),
      s => s.s_nationkey, capacity = 8,
      (s, n) => SuppNation(s.s_suppkey, s.s_name, n))
      .toDF()
      .select(col("s_suppkey"), col("s_name"),
        col("n_name").cast(StringType).as("n_name"))
      .orderBy(col("s_suppkey"))
  }
}
