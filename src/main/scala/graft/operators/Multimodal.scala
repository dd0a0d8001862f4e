package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, Tables}

/** Multimodal-column handling for a training-data pipeline: media payloads
  * are opaque `BINARY` columns with a typed metadata struct alongside
  * (format/width/height/sample-rate), and decode / feature-extract /
  * resize / frame-sample run as typed `mapPartitions` stages — the Scala
  * analogue of Python's `mapInPandas` batch UDFs (one iterator per
  * partition, vectorizable inside, schema declared up front).
  *
  * The container has no image/audio codecs, so [[StubCodec]] is a
  * clearly-marked deterministic fake (byte-histogram "decoder"); the
  * Spark-side plumbing — binary payloads, metadata schema, partition-batch
  * iteration, fixed-shape feature output — is real and is what the specs
  * and the oracle check. Payloads are synthesized from `documents.text`
  * bytes so every stage is reproducible cross-engine.
  */
object Multimodal {

  def defs: Seq[QueryDef] = Seq(q70MediaMetadata, q71MediaFeatures)

  /** One media row: opaque payload + typed metadata (the schema a real
    * ingest would carry; format derived deterministically here). */
  case class Media(doc_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
      features: Array[Float], n_frames: Int)

  /** The media table: binary payload column + metadata struct, derived
    * deterministically from the documents fixture. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    implicit val enc = Encoders.product[Media]
    Tables(spark, dir).documents
      .select(
        col("doc_id"),
        col("text").cast(BinaryType).as("payload"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("format"),
        (col("doc_id") % 64 + 16).cast(IntegerType).as("width"),
        (col("doc_id") % 48 + 16).cast(IntegerType).as("height"))
      .as[Media]
  }

  /** STUB CODEC — deterministic fake standing in for image/audio decode
    * (no codecs in this container). Real deployments swap this object for
    * one wrapping an actual decoder; everything around it stays. */
  object StubCodec {
    val FeatureDim = 16

    /** "Decode" a payload into a fixed-shape feature vector: a normalized
      * 16-bin byte histogram. Deterministic, shape-stable — the contract a
      * real embedding/decode kernel must satisfy. */
    def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      payload.foreach(b => hist((b & 0xFF) % FeatureDim) += 1f)
      val n = math.max(payload.length, 1)
      hist.map(_ / n)
    }

    /** "Frame-sample": every k-th byte is a frame (a video keyframe
      * sampler has the same stride shape). */
    def sampleFrames(payload: Array[Byte], stride: Int): Array[Byte] =
      payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray

    /** "Resize": crop/pad the feature vector to a target dim. */
    def resize(features: Array[Float], dim: Int): Array[Float] =
      if (features.length >= dim) features.take(dim)
      else features ++ Array.fill(dim - features.length)(0f)
  }

  /** Decode + feature-extract + frame-sample as one mapPartitions stage:
    * the per-partition iterator is the batch boundary (like a pandas batch
    * in mapInPandas) — a real codec would amortize model/handle setup per
    * partition exactly here. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition setup happens once (codec/model handle in real life)
      val codec = StubCodec
      rows.map { m =>
        val feats = codec.resize(codec.decodeToFeatures(m.payload), codec.FeatureDim)
        val frames = codec.sampleFrames(m.payload, stride = 32)
        MediaFeatures(m.doc_id, m.format, m.payload.length, feats, frames.length)
      }
    }
  }

  /** Metadata + payload-level plumbing, fully oracle-checkable: byte
    * lengths, format derivation, and header-byte inspection on the binary
    * column happen without ever decoding. */
  val q70MediaMetadata: QueryDef = QueryDef("q70_media_metadata",
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INT)] AS format,
      |  CAST(doc_id % 64 + 16 AS INT) AS width,
      |  CAST(doc_id % 48 + 16 AS INT) AS height,
      |  hex(encode(substring(text, 1, 8))) AS header_hex
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    mediaTable(spark, dir).toDF()
      .select(col("doc_id"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        col("format"), col("width"), col("height"),
        hex(substring(col("payload"), 1, 8)).as("header_hex"))
      .orderBy(col("doc_id"))
  }

  /** The decode/feature pipeline, fully oracle-checked: the stub codec's
    * byte-histogram is SQL-expressible (the corpus is pure ASCII, so byte
    * = codepoint), and the gated output recovers bin 0's RAW COUNT from
    * the normalized float feature (`round(f0 * n_bytes)` — exact, the
    * float's relative error is ~1e-7 of an integer < 2^10) instead of
    * comparing the float division itself, whose last-ulp rounding is
    * engine-specific. Frame count is the stride arithmetic
    * `ceil(len / 32)`; bin-0 bytes are the codepoints ≡ 0 (mod 16),
    * counted by the oracle with a character-class regex. */
  val q71MediaFeatures: QueryDef = QueryDef("q71_media_features",
    """SELECT doc_id,
      |  ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INT)] AS format,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST((octet_length(encode(text)) + 31) // 32 AS BIGINT) AS n_frames,
      |  CAST(length(regexp_replace(text, '[^\x10 0@P\x60p]', '', 'g')) AS BIGINT) AS b0
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    extractFeatures(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("format"),
        col("n_bytes").cast(LongType).as("n_bytes"),
        col("n_frames").cast(LongType).as("n_frames"),
        round(element_at(col("features"), 1).cast(DoubleType) * col("n_bytes"))
          .cast(LongType).as("b0"))
      .orderBy(col("doc_id"))
  }
}
