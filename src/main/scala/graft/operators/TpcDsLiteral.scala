package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Catalog, QueryDef}

/** LITERAL TPC-DS query texts, run unmodified.
  *
  * The reference's defining artifact is 101 runnable TPC-DS query files
  * (reference: TpcDsBatchExecITCase.scala:104-139 over the .sql files
  * under src/test/resources/tpcds/queries/1/). The fixture catalog has no
  * 24-table TPC-DS schema, so the composite family (TpcDsComposites)
  * transplants the *shapes*; this module closes part of the LITERAL gap:
  * a view adapter maps the fixtures onto the TPC-DS names the simple
  * star-report family touches (`store_sales`, `date_dim`, `item`), and
  * the reference's own q3 / q42 / q52 / q55 texts (reference:
  * tpcds/queries/1/{q3,q42,q52,q55}.sql, comment banners stripped,
  * otherwise verbatim) run through `spark.sql` unchanged. The DuckDB
  * oracle prepends the same view definitions as CTEs to the same literal
  * text — one query body, two engines, the mapping stated once.
  *
  * Mapping (deterministic, fixture-derived):
  *   - store_sales: one row per lineitem; sold-date key = epoch-day of
  *     the order date, item key = partkey, ext sales price = extended
  *     price as exact DECIMAL(28,2) — wide enough that BOTH engines'
  *     uncast literal `sum(...)` lands on the max precision DECIMAL(38,2)
  *     (Spark sums p,s → min(38, p+10),s; DuckDB → DECIMAL(38,s)), so
  *     the output type matches the oracle bit-for-bit and the sum is
  *     order-independent in both engines;
  *   - date_dim: the distinct order dates with (d_date_sk, d_year, d_moy);
  *   - item: parts with brand text/id (id parsed from 'Brand#nn'),
  *     category = p_type, category id = p_size, and the two selective
  *     filter columns the texts use derived as partkey residues
  *     (i_manager_id = pk % 50, i_manufact_id = pk % 200).
  */
object TpcDsLiteral {

  def defs: Seq[QueryDef] =
    Seq(literal("qds03_literal", Q3), literal("qds19_literal", Q19),
      literal("qds42_literal", Q42), literal("qds52_literal", Q52),
      literal("qds55_literal", Q55))

  /** The literal bodies by reference file stem — `TpcDsLiteralSpec`
    * diffs each against the reference file on disk (comment banners
    * stripped, whitespace collapsed) to prove verbatimness. */
  def texts: Map[String, String] =
    Map("q3" -> Q3, "q19" -> Q19, "q42" -> Q42, "q52" -> Q52, "q55" -> Q55)

  /** Register the TPC-DS-named views over the fixture tables. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val lineitem = Catalog.load(spark, dir, "lineitem")
    val orders = Catalog.load(spark, dir, "orders")
    val part = Catalog.load(spark, dir, "part")
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast(DateType))
          .cast(IntegerType).as("ss_sold_date_sk"),
        col("l_partkey").as("ss_item_sk"),
        col("o_custkey").as("ss_customer_sk"),
        col("l_suppkey").as("ss_store_sk"),
        col("l_extendedprice").cast(DecimalType(28, 2)).as("ss_ext_sales_price"))
      .createOrReplaceTempView("store_sales")
    // NOTE: shadows the fixture's `customer` name with the TPC-DS-shaped
    // columns. Safe session-wide: every fixture SQL query goes through
    // Catalog.registerAnalyzed, which drops fixture-named temp views on
    // every call, and DataFrame-API queries read the parquet directly.
    Catalog.load(spark, dir, "customer")
      .select(col("c_custkey").as("c_customer_sk"),
        col("c_nationkey").as("c_current_addr_sk"))
      .createOrReplaceTempView("customer")
    Catalog.load(spark, dir, "nation")
      .select(col("n_nationkey").as("ca_address_sk"),
        (lit(10000L) + col("n_nationkey") * 137L).cast(StringType).as("ca_zip"))
      .createOrReplaceTempView("customer_address")
    Catalog.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("s_store_sk"),
        (lit(10000L) + col("s_nationkey") * 137L).cast(StringType).as("s_zip"))
      .createOrReplaceTempView("store")
    orders.select(to_date(col("o_orderdate")).as("d")).distinct()
      .select(
        datediff(col("d"), lit("1970-01-01").cast(DateType))
          .cast(IntegerType).as("d_date_sk"),
        year(col("d")).cast(IntegerType).as("d_year"),
        month(col("d")).cast(IntegerType).as("d_moy"))
      .createOrReplaceTempView("date_dim")
    part.select(
        col("p_partkey").as("i_item_sk"),
        col("p_brand").as("i_brand"),
        substring(col("p_brand"), 7, 10).cast(IntegerType).as("i_brand_id"),
        col("p_type").as("i_category"),
        col("p_size").cast(IntegerType).as("i_category_id"),
        (col("p_partkey") % 50).cast(IntegerType).as("i_manager_id"),
        (col("p_partkey") % 200).cast(IntegerType).as("i_manufact_id"),
        concat(lit("Mfg#"), (col("p_partkey") % 200).cast(IntegerType).cast(StringType))
          .as("i_manufact"))
      .createOrReplaceTempView("item")
  }

  /** The same three views as DuckDB CTE text, prepended to each oracle. */
  private val duckViews: String =
    """store_sales AS (
      |  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS ss_sold_date_sk,
      |    l_partkey AS ss_item_sk,
      |    o_custkey AS ss_customer_sk,
      |    l_suppkey AS ss_store_sk,
      |    CAST(l_extendedprice AS DECIMAL(28,2)) AS ss_ext_sales_price
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |date_dim AS (
      |  SELECT CAST(date_diff('day', DATE '1970-01-01', d) AS INT) AS d_date_sk,
      |    CAST(EXTRACT(YEAR FROM d) AS INT) AS d_year,
      |    CAST(EXTRACT(MONTH FROM d) AS INT) AS d_moy
      |  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)),
      |item AS (
      |  SELECT p_partkey AS i_item_sk, p_brand AS i_brand,
      |    CAST(substr(p_brand, 7) AS INT) AS i_brand_id,
      |    p_type AS i_category, CAST(p_size AS INT) AS i_category_id,
      |    CAST(p_partkey % 50 AS INT) AS i_manager_id,
      |    CAST(p_partkey % 200 AS INT) AS i_manufact_id,
      |    'Mfg#' || CAST(CAST(p_partkey % 200 AS INT) AS VARCHAR) AS i_manufact
      |  FROM part),
      |customer AS (
      |  -- schema-qualified: CTE names cannot carry a schema, so
      |  -- main.customer resolves to the base fixture view even though
      |  -- this CTE shadows the bare name
      |  SELECT c_custkey AS c_customer_sk, c_nationkey AS c_current_addr_sk
      |  FROM main.customer),
      |customer_address AS (
      |  SELECT n_nationkey AS ca_address_sk,
      |    CAST(10000 + n_nationkey * 137 AS VARCHAR) AS ca_zip
      |  FROM nation),
      |store AS (
      |  SELECT s_suppkey AS s_store_sk,
      |    CAST(10000 + s_nationkey * 137 AS VARCHAR) AS s_zip
      |  FROM supplier)""".stripMargin

  private def literal(name: String, body: String): QueryDef =
    QueryDef(name, s"WITH $duckViews\n$body") { (spark, dir) =>
      registerViews(spark, dir)
      spark.sql(body)
    }

  // reference: tpcds/queries/1/q3.sql (banner comments stripped)
  private val Q3: String =
    """select dt.d_year
      |       ,item.i_brand_id brand_id
      |       ,item.i_brand brand
      |       ,sum(ss_ext_sales_price) sum_agg
      | from  date_dim dt
      |      ,store_sales
      |      ,item
      | where dt.d_date_sk = store_sales.ss_sold_date_sk
      |   and store_sales.ss_item_sk = item.i_item_sk
      |   and item.i_manufact_id = 1
      |   and dt.d_moy=11
      | group by dt.d_year
      |      ,item.i_brand
      |      ,item.i_brand_id
      | order by dt.d_year
      |         ,sum_agg desc
      |         ,brand_id
      | limit 100""".stripMargin

  // reference: tpcds/queries/1/q19.sql
  private val Q19: String =
    """select i_brand_id brand_id, i_brand brand, i_manufact_id, i_manufact,
      |       sum(ss_ext_sales_price) ext_price
      | from date_dim, store_sales, item,customer,customer_address,store
      | where d_date_sk = ss_sold_date_sk
      |   and ss_item_sk = i_item_sk
      |   and i_manager_id=1
      |   and d_moy=11
      |   and d_year=1998
      |   and ss_customer_sk = c_customer_sk
      |   and c_current_addr_sk = ca_address_sk
      |   and substr(ca_zip,1,5) <> substr(s_zip,1,5)
      |   and ss_store_sk = s_store_sk
      | group by i_brand
      |      ,i_brand_id
      |      ,i_manufact_id
      |      ,i_manufact
      | order by ext_price desc
      |         ,i_brand
      |         ,i_brand_id
      |         ,i_manufact_id
      |         ,i_manufact
      |limit 100""".stripMargin

  // reference: tpcds/queries/1/q42.sql
  private val Q42: String =
    """select dt.d_year
      |       ,item.i_category_id
      |       ,item.i_category
      |       ,sum(ss_ext_sales_price)
      | from  date_dim dt
      |       ,store_sales
      |       ,item
      | where dt.d_date_sk = store_sales.ss_sold_date_sk
      |       and store_sales.ss_item_sk = item.i_item_sk
      |       and item.i_manager_id = 1
      |       and dt.d_moy=11
      |       and dt.d_year=1998
      | group by      dt.d_year
      |               ,item.i_category_id
      |               ,item.i_category
      | order by       sum(ss_ext_sales_price) desc,dt.d_year
      |               ,item.i_category_id
      |               ,item.i_category
      |limit 100""".stripMargin

  // reference: tpcds/queries/1/q52.sql
  private val Q52: String =
    """select dt.d_year
      |       ,item.i_brand_id brand_id
      |       ,item.i_brand brand
      |       ,sum(ss_ext_sales_price) ext_price
      | from date_dim dt
      |     ,store_sales
      |     ,item
      | where dt.d_date_sk = store_sales.ss_sold_date_sk
      |    and store_sales.ss_item_sk = item.i_item_sk
      |    and item.i_manager_id = 1
      |    and dt.d_moy=11
      |    and dt.d_year=1998
      | group by dt.d_year
      |       ,item.i_brand
      |       ,item.i_brand_id
      | order by dt.d_year
      |       ,ext_price desc
      |       ,brand_id
      |limit 100""".stripMargin

  // reference: tpcds/queries/1/q55.sql
  private val Q55: String =
    """select i_brand_id brand_id, i_brand brand,
      |       sum(ss_ext_sales_price) ext_price
      | from date_dim, store_sales, item
      | where d_date_sk = ss_sold_date_sk
      |       and ss_item_sk = i_item_sk
      |       and i_manager_id=1
      |       and d_moy=11
      |       and d_year=1998
      | group by i_brand, i_brand_id
      | order by ext_price desc, i_brand_id
      |limit 100""".stripMargin
}
