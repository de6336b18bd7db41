package graft

import graft.operators.Similarity
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Parity + bound net for the streaming semantic-dedup twin: arrivals fed
  * in ascending vec_id order must receive exactly the batch
  * semDedupStatus verdicts (first-arrival survivor ≡ min-id survivor)
  * across micro-batch splits, and the per-cell delegate store must honor
  * the cap with the same semantics as the batch representative cap.
  */
class SemDedupStreamSpec extends SparkSpec {

  private def runStream(arrivals: Seq[Seq[(Long, Seq[Double])]],
      centroids: Seq[(Long, Seq[Double])],
      threshold: Double = 0.4,
      cap: Int = Similarity.SemDedupCellCap): Map[Long, (Long, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = Streams.semDedupStream(
        mem.toDF.toDF("vec_id", "embedding"), centroids, threshold, cap)
      .writeStream.format("memory").queryName("semdedup_stream")
      .outputMode("append").start()
    try {
      arrivals.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("semdedup_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS semdedup_stream") }
  }

  test("streamed verdicts == batch q_semdedup across micro-batch splits") {
    val (cents, _) = Similarity.ivfPqModel(spark, sfDir)
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    assert(corpus.length > 100)
    // three uneven micro-batches, still globally vec_id-ascending
    val (b1, rest) = corpus.splitAt(corpus.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val got = runStream(Seq(b1.toSeq, b2.toSeq, b3.toSeq), cents)
    val want = Similarity.semDedupStatus(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the stream sees only quantizable vectors (amax > 0) — same filter
    // the batch quantizedVecs applies, so the keysets must agree exactly
    assert(got.keySet === want.keySet)
    val diff = got.collect { case (id, v) if want(id) != v =>
      s"$id: stream=$v batch=${want(id)}" }
    assert(diff.isEmpty, s"verdict divergence: ${diff.take(5)}")
  }

  test("cap bounds the delegate store with batch-cap semantics") {
    // one centroid -> one cell; three mutually-dissimilar unit-ish axes
    // plus a vector similar only to the SECOND arrival. cap=1 stores only
    // the first delegate, so v4 is judged against v1 alone (kept) — the
    // batch rule with reps capped at rank 1 — while cap=3 judges it
    // against v2 too (dropped).
    val cents = Seq(0L -> Seq.fill(8)(0.0))
    def v(xs: Double*): Seq[Double] = xs.toSeq.padTo(8, 0.0)
    val b = Seq(
      1L -> v(1.0), // axis x
      2L -> v(0.0, 1.0), // axis y
      3L -> v(0.0, 0.0, 1.0), // axis z
      4L -> v(0.0, 1.0, 0.3)) // cos≈0.96 with v2, 0 with v1
    val capped = runStream(Seq(b), cents, threshold = 0.4, cap = 1)
    assert(capped(4L)._2 === "kept")
    assert(Seq(1L, 2L, 3L).forall(capped(_)._2 == "kept"))
    val full = runStream(Seq(b), cents, threshold = 0.4, cap = 3)
    assert(full(4L)._2 === "dropped")
    // exact duplicate of a STORED delegate drops at any cap
    val dup = runStream(Seq(b :+ (5L -> v(1.0))), cents, 0.4, cap = 1)
    assert(dup(5L)._2 === "dropped")
  }

  test("out-of-order cross-batch arrivals are counted, in-order stays 0") {
    val cents = Seq(0L -> Seq.fill(8)(0.0))
    def v(xs: Double*): Seq[Double] = xs.toSeq.padTo(8, 0.0)
    // in-order: two ascending batches -> accumulator 0
    runStream(Seq(Seq(1L -> v(1.0)), Seq(2L -> v(0.0, 1.0))), cents)
    assert(Streams.semDedupOutOfOrder.map(_.value) === Some(0L))
    // regression: batch 2's id dips below batch 1's max-seen -> counted
    runStream(Seq(Seq(5L -> v(1.0)), Seq(2L -> v(0.0, 1.0))), cents)
    assert(Streams.semDedupOutOfOrder.map(_.value) === Some(1L))
  }

  test("empty model fails fast") {
    intercept[IllegalArgumentException] {
      Streams.semDedupStream(
        Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
        Seq.empty)
    }
  }
}
