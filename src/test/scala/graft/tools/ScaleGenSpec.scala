package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Catalog

/** The SF1 soak stands on ScaleGen's tiling being CORRECT — wrong strides
  * would silently orphan foreign keys and every scaled plan observation
  * would describe a different (broken) join graph. Pinned here:
  * cardinalities scale exactly, no FK dangles (uniform AND skew mode),
  * and regeneration is byte-deterministic (the DuckDB rows-level check at
  * sf1 assumes re-runs reproduce the same corpus). */
class ScaleGenSpec extends SparkSpec {

  private def gen(factor: Int, hotFrac: Double = 0.0): String = {
    val out = java.nio.file.Files.createTempDirectory("scalegen-spec").toString
    ScaleGen.scale(spark, sf(), out, factor, hotFrac)
    out
  }

  test("tiling scales cardinalities exactly and preserves FK closure") {
    val out = gen(3)
    val base = (t: String) => Catalog.load(spark, sf(), t)
    val big = (t: String) => Catalog.load(spark, out, t)
    // fixed dimensions copied, keyed tables exactly factor×
    assert(big("region").count() == base("region").count())
    assert(big("nation").count() == base("nation").count())
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings").foreach { t =>
      assert(big(t).count() == 3 * base(t).count(), s"$t cardinality")
    }
    // FK closure: every scaled fact key resolves to exactly one parent
    def dangling(fact: String, fk: String, dim: String, pk: String): Long =
      big(fact).select(col(fk).as("k"))
        .join(big(dim).select(col(pk).as("k")), Seq("k"), "left_anti").count()
    assert(dangling("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(dangling("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(dangling("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0)
    assert(dangling("orders", "o_custkey", "customer", "c_custkey") == 0)
    // per-replica join structure: each order keeps its base lineitem fan
    val baseFan = base("lineitem").groupBy("l_orderkey").count()
      .agg(max("count")).head.getLong(0)
    val bigFan = big("lineitem").groupBy("l_orderkey").count()
      .agg(max("count")).head.getLong(0)
    assert(bigFan == baseFan, "tiling changed per-order lineitem fan-out")
  }

  test("skew mode concentrates part FKs on one hot key, FKs stay closed") {
    val out = gen(2, hotFrac = 0.4)
    val li = Catalog.load(spark, out, "lineitem")
    val dangling = li.select(col("l_partkey").as("k"))
      .join(Catalog.load(spark, out, "part").select(col("p_partkey").as("k")),
        Seq("k"), "left_anti").count()
    assert(dangling == 0, "skew mode orphaned part FKs")
    val n = li.count()
    val hot = li.groupBy("l_partkey").count()
      .orderBy(col("count").desc).head()
    // the hot key carries ≈ hotFrac of the fact table (hash draw, ±5pp)
    val frac = hot.getLong(1).toDouble / n
    assert(frac > 0.35 && frac < 0.45,
      s"hot key carries $frac of lineitem, expected ~0.4")
  }

  test("hot-order mode concentrates order keys on one mega-order, FKs " +
      "stay closed") {
    val out = java.nio.file.Files.createTempDirectory("scalegen-spec").toString
    ScaleGen.scale(spark, sf(), out, 2, hotFrac = 0.0, hotOrderFrac = 0.2)
    val li = Catalog.load(spark, out, "lineitem")
    val dangling = li.select(col("l_orderkey").as("k"))
      .join(Catalog.load(spark, out, "orders")
        .select(col("o_orderkey").as("k")), Seq("k"), "left_anti").count()
    assert(dangling == 0, "hot-order mode orphaned order FKs")
    val n = li.count()
    val hot = li.groupBy("l_orderkey").count()
      .orderBy(col("count").desc).head()
    val frac = hot.getLong(1).toDouble / n
    assert(frac > 0.15 && frac < 0.25,
      s"hot order carries $frac of lineitem, expected ~0.2")
    // the hot order is the base min order key (owned by replica 0)
    val minOrder = Catalog.load(spark, sf(), "orders")
      .agg(min(col("o_orderkey"))).head.getLong(0)
    assert(hot.getLong(0) == minOrder)
  }

  test("regeneration is deterministic: two runs produce identical rows") {
    val a = gen(2)
    val b = gen(2)
    Seq("lineitem", "documents", "embeddings").foreach { t =>
      val left = Catalog.load(spark, a, t)
      val right = Catalog.load(spark, b, t)
      assert(left.exceptAll(right).isEmpty && right.exceptAll(left).isEmpty,
        s"$t differs between identical ScaleGen runs")
    }
  }
}
