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

  test("chunking reassembles: chunk lengths sum to doc length, hashes chain") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_mm_chunks")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docLens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .where(col("n") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet === docLens.keySet)
    byDoc.foreach { case (id, cs) =>
      assert(cs.map(_._3).sum === docLens(id), s"doc $id chunk-length sum")
      assert(cs.map(_._2).sorted.toSeq === (1L to cs.length), s"doc $id idx")
      // every chunk except the last is exactly 64 units
      assert(cs.sortBy(_._2).dropRight(1).forall(_._3 == 64L), s"doc $id sizes")
    }
  }

  test("chunk dedup: exact payload copies pair up, disjoint payloads don't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mmdedup").toString
    val big = (1 to 40).map(i => f"block$i%04d payload segment").mkString(" ")
    val other = (1 to 40).map(i => f"wholly$i%04d different bytes").mkString(" ")
    Seq(
      (1L, big, "en", "s", big.length.toLong),
      (2L, big, "en", "s", big.length.toLong), // byte-identical re-upload
      (3L, "tiny", "en", "s", 4L), // < 3 chunks: can never pair
      (4L, other, "en", "s", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q_mm_dedup")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }
}
