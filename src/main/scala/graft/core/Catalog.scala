package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit catalog over the driver-generated parquet fixtures.
  *
  * The reference registers fixed, explicit schemas per table
  * (reference: flink-table-planner-blink .../table/tpc/TpcDsSchemaProvider.scala:50-669);
  * we do the same with [[StructType]]s — no schema inference on the hot path.
  * Schemas below were pinned from the parquet footers of
  * /root/testdata/sf0.001 (TESTDATA.md) and must match them exactly.
  */
object Catalog {

  /** All fixture tables, one parquet file each under `<sfDir>/<name>.parquet`. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    // for: it is read as nanos-since-epoch (LongType) under
    // spark.sql.legacy.parquet.nanosAsLong=true (set by SessionFactory) and
    // converted with [[Catalog.tsFromNanos]] where timestamp semantics are
    // needed. Nanos-long ordering == timestamp ordering, so pure ORDER BY /
    // PARTITION BY usage needs no conversion.
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Microsecond timestamp from the nanos-long `events.ts` column (integral
    * division keeps full precision; a double roundtrip would not at ~1e18). */
  def tsFromNanos(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(s"timestamp_micros($colName DIV 1000)")

  /** Read one fixture table with its pinned schema (column pruning + filter
    * pushdown reach the vectorized parquet scan; verified via
    * `.explain("formatted")` — `PushedFilters`/`ReadSchema`). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.schema(schemas(name)).parquet(path(dir, name))

  /** Register every fixture as a temp view so `spark.sql` queries see the
    * same names the DuckDB oracle uses. Temp views carry size-only
    * statistics — use [[registerAnalyzed]] on any path where the
    * cost-based optimizer should see row counts. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Wide text-payload columns excluded from column-level statistics:
    * NDV/min/max over multi-KB strings is the expensive part of ANALYZE
    * (it dominates the whole-catalog pass) and never steers the planner —
    * payload columns are not join keys or selective filters. At 100 TB
    * the same rule holds: analyze the key/dimension columns, skip the
    * document bodies. */
  private val statsExclude: Map[String, Set[String]] = Map(
    "documents" -> Set("text"),
    "events" -> Set("props"))

  /** Columns ANALYZE computes column-level statistics for: scalar types
    * only (embeddings.embedding is an array — table-level stats only),
    * minus the wide payload columns above. */
  private def statsColumns(table: String, schema: StructType): Seq[String] = {
    val excluded = statsExclude.getOrElse(table, Set.empty)
    schema.fields.collect {
      case f if !f.dataType.isInstanceOf[ArrayType] &&
        !f.dataType.isInstanceOf[MapType] &&
        !f.dataType.isInstanceOf[StructType] &&
        !excluded.contains(f.name) => f.name
    }.toSeq
  }

  /** Register every fixture as an ANALYZED catalog table.
    *
    * Spark's cost-based join reorder (`spark.sql.cbo.joinReorder.enabled`,
    * on in [[SessionFactory]] for parity with the reference bench knobs —
    * reference: flink-table-planner-blink .../tpc/TpcDsBatchExecITCase.scala:71-72
    * turns join reorder on for the whole TPC-DS run) only fires when every
    * item of a multi-join carries a rowCount statistic, and filter/join
    * selectivity estimation additionally needs per-column NDV/min/max —
    * the same catalog statistics that feed the reference's metadata
    * handlers (reference: PB/plan/metadata/FlinkRelMdRowCount.scala et al).
    * Path-based temp views carry size-only stats, so with [[registerAll]]
    * those two config lines are inert; this variant creates external
    * parquet tables and runs `ANALYZE TABLE … COMPUTE STATISTICS FOR
    * COLUMNS …` so the 7-8-table join graphs of the SQL corpus get
    * cost-based ordering — on a 100 TB catalog this is the difference
    * between a dimension-first plan and a fact-times-fact accident.
    *
    * Idempotent per (session, dir): every SQL query entry point calls this,
    * so re-registration (and re-analysis) is skipped when the session has
    * already analyzed the same scale-factor directory.
    */
  def registerAnalyzed(spark: SparkSession, dir: String): Unit = synchronized {
    val marker = "graft.analyzed.dir"
    if (spark.conf.getOption(marker).contains(dir)) {
      // already analyzed this dir — but a temp view registered since (e.g.
      // registerAll in the same session) would shadow the catalog tables
      // and silently starve the planner of statistics; always clear them
      tableNames.foreach(spark.catalog.dropTempView)
      return
    }
    tableNames.foreach { n =>
      // a leftover temp view would shadow the catalog table
      spark.catalog.dropTempView(n)
      spark.sql(s"DROP TABLE IF EXISTS $n")
      spark.sql(
        s"CREATE TABLE $n (${schemas(n).toDDL}) USING parquet LOCATION '${path(dir, n)}'")
      val cols = statsColumns(n, schemas(n))
      if (cols.isEmpty)
        spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS")
      else
        spark.sql(
          s"ANALYZE TABLE $n COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")
    }
    spark.conf.set(marker, dir)
  }
}

/** Convenience handle: one object per scale-factor directory. */
final case class Tables(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = Catalog.load(spark, dir, name)
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def events: DataFrame = t("events")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
