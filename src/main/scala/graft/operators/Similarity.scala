package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim):
  * brute-force cosine top-k as the exactness baseline, threshold near-dup
  * pairs, and a random-hyperplane LSH variant as the 100 TB scale path.
  *
  * The vector algebra is pure column expressions (`zip_with` dot product,
  * `aggregate` folds in DOUBLE, left-to-right — deterministic under any
  * partitioning), so everything stays inside codegen; no UDFs.
  *
  * Scale design: brute-force kNN is O(|Q|·n) with the corpus broadcast or
  * shuffled once — correct when |Q| is small; the LSH path buckets vectors
  * by sign-pattern so candidate generation is O(n·tables) and each probe
  * touches only its bucket.
  */
object Similarity {

  def defs: Seq[QueryDef] = Seq(q50CosineKnn, q51CosineNearDup, q52AnnLsh)

  /** embedding (float) → double array (parity: oracle casts the same way). */
  private def asDouble(c: Column): Column =
    transform(c, x => x.cast(DoubleType))

  /** Sequential left fold sum — same association order as DuckDB's
    * list_reduce, hence bit-identical doubles. */
  private def seqSum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  private def dot(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => x * y))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private val duckCosine =
    """list_reduce(list_apply(range(1, 65), i -> ea[i] * eb[i]), (a, x) -> a + x)
      |    / (sqrt(list_reduce(list_apply(range(1, 65), i -> ea[i] * ea[i]), (a, x) -> a + x))
      |       * sqrt(list_reduce(list_apply(range(1, 65), i -> eb[i] * eb[i]), (a, x) -> a + x)))""".stripMargin

  private val duckPairsCte =
    s"""pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    $duckCosine AS cos
       |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ea
       |        FROM embeddings WHERE vec_id < 20) q
       |  JOIN (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS eb
       |        FROM embeddings) c
       |    ON q.vec_id <> c.vec_id)""".stripMargin

  /** Brute-force cosine top-5 neighbors for the first 20 query vectors
    * (reference has no ANN operator — this is the LLM-pipeline extension;
    * rank ties broken by neighbor id). */
  val q50CosineKnn: QueryDef = QueryDef("q50_cosine_knn",
    s"""WITH $duckPairsCte
       |SELECT query_id, neighbor_id, rnk, round(cos, 9) AS cos_r
       |FROM (SELECT query_id, neighbor_id, cos,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |                           ORDER BY cos DESC, neighbor_id) AS rnk
       |      FROM pairs)
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val q = t.embeddings.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("ea"))
    val c = t.embeddings
      .select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("eb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 9).as("cos_r"))
      .orderBy(col("query_id"), col("rnk"))
  }

  private val duckAllPairsCte =
    s"""pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    $duckCosine AS cos
       |  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ea
       |        FROM embeddings) a
       |  JOIN (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS eb
       |        FROM embeddings) b
       |    ON a.vec_id < b.vec_id)""".stripMargin

  /** Embedding-cosine near-duplicate pairs (threshold mining). 0.46 sits in
    * a verified gap of the fixture's similarity distribution (closest mass
    * at 0.4597/0.4666), so the answer is boundary-stable. */
  val q51CosineNearDup: QueryDef = QueryDef("q51_cosine_near_dup",
    s"""WITH $duckAllPairsCte
       |SELECT id_a, id_b, round(cos, 9) AS cos_r
       |FROM pairs WHERE cos >= 0.46
       |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir)
    val a = t.embeddings.select(col("vec_id").as("id_a"), asDouble(col("embedding")).as("ea"))
    val b = t.embeddings.select(col("vec_id").as("id_b"), asDouble(col("embedding")).as("eb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .filter(col("cos") >= 0.46)
      .select(col("id_a"), col("id_b"), round(col("cos"), 9).as("cos_r"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // On this fixture the true neighbors sit at cos 0.35-0.51 (near-
  // orthogonal), so buckets must stay coarse: P(bit agrees) = 1 - theta/pi
  // ~= 0.62-0.67, and 4 bits x 10 tables gives pair-recall ~0.75. On a
  // real near-dup corpus (cos > 0.9) the same structure works with far
  // more bits per table; both are just these two knobs.
  private val Planes = 4 // sign bits per LSH table
  private val Tables_ = 10

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): xxhash64 folded to [-1, 1]. */
  private def planeComponent(tbl: Int, plane: Int, dim: Column): Column =
    (xxhash64(lit(tbl), lit(plane), dim).cast(DoubleType) / lit(Long.MaxValue.toDouble))

  /** LSH-bucketed approximate nearest neighbors: 10 tables × 4
    * random-hyperplane sign bits; candidates share a bucket in ≥1 table,
    * then exact cosine + top-3. Approximate by construction → rows-only
    * gate; the spec asserts top-3 recall ≥ 0.7 against [[q50CosineKnn]]. */
  val q52AnnLsh: QueryDef = QueryDef.rowsOnly("q52_ann_lsh") { (spark, dir) =>
    annLsh(spark, dir)
  }

  /** Shared implementation so the recall spec can call it directly. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val emb = t.embeddings.select(col("vec_id"), asDouble(col("embedding")).as("e"))

    // sign-bit bucket id per table: bit p set iff dot(v, plane_p) >= 0
    def bucket(tbl: Int): Column =
      (0 until Planes).map { p =>
        val proj = seqSum(zip_with(col("e"),
          transform(sequence(lit(1), lit(64)), d => planeComponent(tbl, p, d)),
          (x, h) => x * h))
        when(proj >= 0, lit(1L << p)).otherwise(0L)
      }.reduce[Column](_ + _)

    val buckets = emb.select(col("vec_id"), col("e"),
      posexplode(array((0 until Tables_).map(bucket): _*)).as(Seq("tbl", "bucket")))

    val q = buckets.filter(col("vec_id") < 20)
      .select(col("tbl"), col("bucket"), col("vec_id").as("query_id"), col("e").as("ea"))
    val c = buckets
      .select(col("tbl"), col("bucket"), col("vec_id").as("neighbor_id"), col("e").as("eb"))
    val candidates = q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("ea"), col("eb"))
      .dropDuplicates("query_id", "neighbor_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    candidates
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos"), 9).as("cos_r"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
