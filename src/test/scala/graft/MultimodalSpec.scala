package graft

import graft.operators.Multimodal.FakeDecoder

/** The multimodal tier's Spark-side plumbing (binary encoding, partition-
  * batched decode, feature shape) — the decoder itself is a documented
  * deterministic stub.
  */
class MultimodalSpec extends SparkSpec {

  test("FakeDecoder is deterministic with a fixed feature shape") {
    val bytes = "hello".getBytes("UTF-8")
    val f1 = FakeDecoder.decode(bytes)
    val f2 = FakeDecoder.decode(bytes)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === FakeDecoder.featureDim)
    assert(FakeDecoder.decode(Array.emptyByteArray).toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("mapPartitions feature extraction covers every document") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val feats = SparkEntry.queries("q_mm_features")(spark, sfDir).collect()
    assert(feats.length.toLong === nDocs)
    // f_len equals the utf-8 byte length reported by q_mm_meta
    val meta = SparkEntry.queries("q_mm_meta")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats.foreach { r =>
      assert(r.getDouble(1) === meta(r.getLong(0)).toDouble)
    }
  }
}
