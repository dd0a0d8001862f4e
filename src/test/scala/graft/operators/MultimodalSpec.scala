package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._

/** Specs for the multimodal plumbing: schema, fixed feature shape,
  * determinism, and stub-codec kernel behavior. */
class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata") {
    val df = mediaTable(spark, sf()).toDF()
    val s = df.schema
    assert(s("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(s("format").dataType == org.apache.spark.sql.types.StringType)
    assert(df.count() > 0)
  }

  test("feature extraction yields fixed-shape normalized vectors") {
    val feats = extractFeatures(mediaTable(spark, sf())).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == StubCodec.FeatureDim))
    // histogram is normalized: sums to ~1
    feats.take(20).foreach { f =>
      assert(math.abs(f.features.sum - 1.0) < 1e-4, s"doc ${f.doc_id}")
    }
    // frame sampling: ceil(n_bytes / 32)
    assert(feats.forall(f => f.n_frames == (f.n_bytes + 31) / 32))
  }

  test("pipeline is deterministic across runs") {
    val a = extractFeatures(mediaTable(spark, sf())).collect()
      .map(f => (f.doc_id, f.features.toSeq)).sortBy(_._1)
    val b = extractFeatures(mediaTable(spark, sf())).collect()
      .map(f => (f.doc_id, f.features.toSeq)).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("stub codec kernels: histogram, stride sampling, resize") {
    val payload = Array.tabulate(64)(i => i.toByte)
    val h = StubCodec.decodeToFeatures(payload)
    assert(h.length == 16 && math.abs(h.sum - 1.0) < 1e-6)
    assert(h.forall(_ == 4f / 64)) // uniform bytes → uniform histogram
    assert(StubCodec.sampleFrames(payload, 32).toSeq == Seq(0.toByte, 32.toByte))
    assert(StubCodec.resize(Array(1f, 2f), 4).toSeq == Seq(1f, 2f, 0f, 0f))
    assert(StubCodec.resize(Array(1f, 2f, 3f), 2).toSeq == Seq(1f, 2f))
  }
}
