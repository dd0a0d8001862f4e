package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: tile a fixture directory N× into a larger scale factor.
  *
  * The reference's defining correctness harness executes its 101 TPC-DS
  * queries at scale factor 1 over dsdgen data (reference:
  * flink-table-planner-blink .../tpc/TpcDsBatchExecITCase.scala:44,104-139);
  * the driver-provided fixtures stop at sf0.1. This tool closes that gap
  * inside the sandbox: it replicates each driver table `factor` times with
  * per-replica key offsets, so every foreign key still lands on exactly one
  * scaled dimension row and per-replica join structure is preserved —
  * cardinalities, join fan-outs and aggregate group counts all scale
  * linearly, which is what plan-shape behavior (broadcast demotions, AQE
  * skew splits, spills) responds to.
  *
  * Scaling rules (strides = observed max key + 1, read from the base dir):
  *  - region/nation: fixed dimensions, copied as-is (TPC-H keeps both
  *    constant across scale factors).
  *  - customer/supplier/part/orders/lineitem: surrogate keys offset by
  *    `replica * stride`; l_orderkey↔o_orderkey, l_partkey↔p_partkey,
  *    l_suppkey↔s_suppkey, o_custkey↔c_custkey all stay consistent.
  *  - events: event_id/user_id offset; timestamps unchanged (same window,
  *    factor× the density — how real traffic scales).
  *  - documents: doc_id offset; replicas >0 get a short `r<i> ` text
  *    prefix so the corpus does not become factor× exact duplicates of
  *    itself (which would turn every dedup operator's output into a
  *    degenerate one-cluster answer); the prefix shifts a handful of
  *    shingles, so replicas are realistic near-duplicates instead.
  *  - embeddings: vec_id offset; replicas >0 get one coordinate nudged by
  *    a small deterministic per-replica delta, for the same reason in
  *    cosine space (exact ties in every distance would make ANN top-k
  *    tie-break-bound rather than geometry-bound).
  *
  * NOT part of the shipped library surface: this is harness tooling, like
  * [[Explain]] — determinism matters (re-runs must produce byte-identical
  * semantics for the DuckDB oracle), driver-side realism does not.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val base = args(0)
    val out = args(1)
    val factor = args(2).toInt
    // optional 4th arg: fraction of lineitem part FKs collapsed onto ONE
    // hot part key (0 = uniform tiling). Uniform tiling preserves the
    // fixtures' balanced key distributions, so AQE's skew split can never
    // fire on it; a hot-key variant makes the split observable on real
    // queries (SCALE.md "AQE skew splitting").
    val hotFrac = if (args.length > 3) args(3).toDouble else 0.0
    // optional 5th arg: fraction of lineitem ORDER keys collapsed onto
    // one hot order (0 = none). The part-key mode above skews the
    // item-keyed SMJs (tpch08/09/19; qds72/qds14a via cs_item_sk =
    // l_partkey); the TPC-DS order-number self-joins (qds95's ws_wh
    // CTE joins on ws_order_number = l_orderkey) are order-keyed, so
    // observing a live split there needs a hot ORDER — one mega-order
    // carrying ~hotOrderFrac of the fact's lines (FK stays valid: the
    // hot key is the base corpus's minimum o_orderkey, owned by
    // replica 0).
    val hotOrderFrac = if (args.length > 4) args(4).toDouble else 0.0
    require(factor >= 1, s"factor must be >= 1, got $factor")
    require(hotFrac >= 0.0 && hotFrac < 1.0, s"hotFrac out of range: $hotFrac")
    require(hotOrderFrac >= 0.0 && hotOrderFrac < 1.0,
      s"hotOrderFrac out of range: $hotOrderFrac")
    val spark = graft.core.SessionFactory.local("graft-scalegen")
    graft.core.Catalog.assertFixtureSchemas(spark, base)
    scale(spark, base, out, factor, hotFrac, hotOrderFrac)
    spark.stop()
  }

  /** Columns whose values are offset by `replica * (max+1)` per table. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** The stride source per key column: the table that OWNS the key space
    * (foreign keys must use the owner's stride, not their own max —
    * o_custkey's max equals c_custkey's max here, but keying the stride on
    * the owning table is what makes that an invariant rather than a
    * coincidence). */
  private val strideOwner: Map[String, (String, String)] = Map(
    "c_custkey" -> ("customer", "c_custkey"),
    "s_suppkey" -> ("supplier", "s_suppkey"),
    "p_partkey" -> ("part", "p_partkey"),
    "o_orderkey" -> ("orders", "o_orderkey"),
    "o_custkey" -> ("customer", "c_custkey"),
    "l_orderkey" -> ("orders", "o_orderkey"),
    "l_partkey" -> ("part", "p_partkey"),
    "l_suppkey" -> ("supplier", "s_suppkey"),
    "event_id" -> ("events", "event_id"),
    "user_id" -> ("events", "user_id"),
    "doc_id" -> ("documents", "doc_id"),
    "vec_id" -> ("embeddings", "vec_id"))

  def scale(spark: SparkSession, base: String, out: String,
      factor: Int, hotFrac: Double = 0.0,
      hotOrderFrac: Double = 0.0): Unit = {
    import graft.core.Catalog
    // one tiny aggregate per owned key space — strides for the offsets
    val strides: Map[String, Long] = strideOwner.values.toSeq.distinct.map {
      case (table, col0) =>
        val m = Catalog.load(spark, base, table)
          .agg(max(col(col0))).head.getLong(0)
        (table, col0) -> (m + 1)
    }.toMap.map { case ((_, c), v) => c -> v }

    Catalog.tableNames.foreach { t =>
      val src = Catalog.load(spark, base, t)
      val tiled: DataFrame =
        if (!keyCols.contains(t)) src // fixed dimensions: region, nation
        else {
          // one source scan, exploded factor×: cheaper and more
          // deterministic than a self-union chain, and keeps the write a
          // single stage
          val exploded = src.withColumn("replica",
            explode(array((0 until factor).map(lit): _*)))
          val offset = keyCols(t).foldLeft(exploded) { (df, c) =>
            df.withColumn(c,
              col(c) + col("replica") * lit(strides(strideOwner(c)._2)))
          }
          val salted = t match {
            case "lineitem" if hotFrac > 0 || hotOrderFrac > 0 =>
              // collapse a deterministic per-row fraction of part FKs onto
              // the base corpus's minimum part key (owned by replica 0, so
              // the FK stays valid); row identity (orderkey, linenumber)
              // drives the draw, so the hot rows spread over all orders
              // and the hot key's shuffle partition carries ~hotFrac of
              // the whole fact table — the shape OptimizeSkewedJoin exists
              // for
              val hotKey = graft.core.Catalog.load(spark, base, "part")
                .agg(min(col("p_partkey"))).head.getLong(0)
              val partHot = offset.withColumn("l_partkey",
                when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
                  lit(10000)) < lit((hotFrac * 10000).toInt), lit(hotKey))
                  .otherwise(col("l_partkey")))
              if (hotOrderFrac == 0) partHot
              else {
                // one mega-order: a distinct-hash draw (seeded 42 so the
                // two hot modes stay independent) collapses l_orderkey
                // onto the base min order — the order-number self-joins
                // (qds95's ws_wh) then carry ~hotOrderFrac of the fact
                // in one shuffle partition. The hot lines inherit the
                // hot order's o_orderdate/o_custkey through the join,
                // which is what a real hot entity does.
                val hotOrder = graft.core.Catalog.load(spark, base, "orders")
                  .agg(min(col("o_orderkey"))).head.getLong(0)
                partHot.withColumn("l_orderkey",
                  when(pmod(xxhash64(lit(42), col("l_orderkey"),
                    col("l_linenumber")), lit(10000))
                    < lit((hotOrderFrac * 10000).toInt), lit(hotOrder))
                    .otherwise(col("l_orderkey")))
              }
            case "documents" =>
              // replicas become near-duplicates, not exact duplicates
              offset.withColumn("text",
                when(col("replica") === 0, col("text"))
                  .otherwise(concat(lit("r"), col("replica"), lit(" "),
                    col("text"))))
            case "embeddings" =>
              // nudge coordinate (replica % dim) by 1e-3·replica: breaks
              // exact cosine ties between replicas, preserves geometry
              offset.withColumn("embedding",
                when(col("replica") === 0, col("embedding")).otherwise(
                  expr("transform(embedding, (x, j) -> " +
                    "CAST(x + IF(j = replica % size(embedding), " +
                    "1e-3 * replica, 0d) AS FLOAT))")))
            case _ => offset
          }
          salted.drop("replica")
        }
      // enforce the catalog column order + types on the way out, so the
      // scaled footer passes assertFixtureSchemas like a driver fixture
      val shaped = tiled.select(Catalog.schemas(t).fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      // a handful of multi-MB files per big table: splittable for scan
      // parallelism without a small-files explosion
      val parts = if (Seq("lineitem", "orders", "events").contains(t)) 8
        else 1
      shaped.repartition(parts)
        .write.mode("overwrite").parquet(Catalog.path(out, t))
      println(s"[scalegen] $t -> ${Catalog.path(out, t)}")
    }
  }
}
