package graft

import graft.operators.Similarity
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Parity net for the streaming IVF-PQ index maintenance path: a vector
  * streamed through `ivfPqEncodeStream` (stateless map-side encode
  * against the trained model) must receive BIT-identically the
  * (cid, codes) row a full batch index rebuild gives it — across
  * micro-batch boundaries, since the operator holds no state.
  */
class IvfPqStreamSpec extends SparkSpec {

  /** (vec_id -> (cid, codes)) from the batch serve frames — the rows a
    * rebuild materializes (q_ivfpq_index's shape).
    */
  private lazy val batchIndex: Map[Long, (Long, Seq[Long])] =
    SparkEntry.queries("q_ivfpq_index")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2).split(',').toSeq.map(_.toLong))).toMap

  test("streamed arrivals get the exact batch-rebuild index rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (cents, cb) = Similarity.ivfPqModel(spark, sfDir)
    assert(cents.size === 4 && cb.size === 32)
    // arrivals = a slice of the corpus (float->double is exact, so
    // feeding the doubles the batch path derives is the same input)
    val arrivals = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(arrivals.length > 20)
    val mem = MemoryStream[(Long, Seq[Double])]
    val enc = Streams.ivfPqEncodeStream(
      mem.toDF.toDF("vec_id", "embedding"), cents, cb)
    val q = enc.writeStream.format("memory").queryName("ivfpq_enc")
      .outputMode("append").start()
    try {
      val (h, t) = arrivals.splitAt(arrivals.length / 2)
      mem.addData(h.toSeq); q.processAllAvailable() // two micro-batches:
      mem.addData(t.toSeq); q.processAllAvailable() // stateless ⇒ no carry
      val got = spark.table("ivfpq_enc").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
      assert(got.size === arrivals.length)
      got.foreach { case (id, (cid, codes)) =>
        val (bCid, bCodes) = batchIndex(id)
        assert(cid === bCid, s"vec $id: stream cell $cid != batch $bCid")
        assert(codes === bCodes, s"vec $id: stream codes $codes != $bCodes")
      }
    } finally q.stop()
  }

  test("the encode plan is stateless and shuffle-free (append-safe)") {
    val (cents, cb) = Similarity.ivfPqModel(spark, sfDir)
    // batch frame through the same function — identical plan shape
    val enc = Streams.ivfPqEncodeStream(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
      cents, cb)
    val plan = enc.queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "streaming encode must stay map-only")
  }

  test("empty model fails fast instead of emitting an unindexable row") {
    intercept[IllegalArgumentException] {
      Streams.ivfPqEncodeStream(
        Tables.embeddings(spark, sfDir).select("vec_id", "embedding"),
        Seq.empty, Seq.empty)
    }
  }
}
