package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core.Catalog

/** Footer-pinning fail-fast (FIXTURES.md:14 — "Read the parquet footer at
  * startup to pin the exact column names/types in code; do not guess").
  *
  * Round 6 lost 9 queries to a silent fixture regeneration: `events.ts`
  * flipped from TIMESTAMP(NANOS) (read as a nanos-long) to timestamp[us],
  * and the engine kept dividing by 1000 — every window collapsed and no
  * error was raised. These specs pin the contract that prevents a repeat:
  *  - every fixture footer must match the catalog's pinned schema
  *    (timestamp unit included) or the engine throws a readable error
  *    BEFORE any query runs;
  *  - the one sanctioned drift axis — events.ts as nanos-long vs
  *    timestamp — is absorbed by [[Catalog.load]], normalized to
  *    TimestampType either way.
  */
class FixtureSchemaSpec extends SparkSpec {

  test("current fixtures pass the footer assertion at every scale factor") {
    Catalog.assertFixtureSchemas(spark, sf("sf0.001"))
    Catalog.assertFixtureSchemas(spark, sf("sf0.01"))
  }

  test("events.ts is normalized to TimestampType by load") {
    val ts = Catalog.load(spark, sf(), "events").schema("ts")
    assert(ts.dataType === TimestampType)
  }

  test("a drifted fixture fails loudly with observed-vs-expected types") {
    val dir = Files.createTempDirectory("graft-drift").toString
    // regenerate `events` with ts as a plain int (a unit/type flip the
    // engine cannot absorb) — the assert must name both schemas
    spark.range(10).selectExpr(
      "id AS event_id", "CAST(id AS INT) AS ts", "id AS user_id",
      "'view' AS event_type", "CAST(id AS DOUBLE) AS value", "'' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Catalog.tableNames.filterNot(_ == "events").foreach { n =>
      Catalog.load(spark, sf(), n).limit(1).write.mode("overwrite")
        .parquet(s"$dir/$n.parquet")
    }
    val e = intercept[IllegalStateException] {
      Catalog.assertFixtureSchemas(spark, dir)
    }
    assert(e.getMessage.contains("events.parquet"))
    assert(e.getMessage.contains("observed"))
    assert(e.getMessage.contains("expected"))
    assert(e.getMessage.contains("ts: int"))
  }

  test("nanos-long events fixture is absorbed: identical instants either way") {
    val dir = Files.createTempDirectory("graft-nanos").toString
    // write the OLD fixture encoding: ts as nanos-since-epoch int64
    Catalog.load(spark, sf(), "events")
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Catalog.tableNames.filterNot(_ == "events").foreach { n =>
      Catalog.load(spark, sf(), n).write.mode("overwrite")
        .parquet(s"$dir/$n.parquet")
    }
    Catalog.assertFixtureSchemas(spark, dir) // sanctioned drift → no throw
    val normalized = Catalog.load(spark, dir, "events")
    assert(normalized.schema("ts").dataType === TimestampType)
    val a = Catalog.load(spark, sf(), "events")
      .select("event_id", "ts").orderBy("event_id").collect().toSeq
    val b = normalized.select("event_id", "ts").orderBy("event_id").collect().toSeq
    assert(a === b)
  }
}
