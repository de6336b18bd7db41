package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming semantics: AvailableNow catch-up (checkpoint as high-water-
  * mark), session-window gap dedup, bounded-state event dedup.
  */
class StreamsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("activity_id", LongType),
    StructField("value", DoubleType)))

  test("catch-up processes only files unseen by the checkpoint") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream")
    val src = base.resolve("src").toString
    val chk = base.resolve("chk").toString
    val out = base.resolve("out").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("activity_id", "value")
      .write.mode("append").parquet(src)
    Streams.catchUp(spark, src, chk, out, schema,
      df => df.withColumn("doubled", col("value") * 2))
    assert(spark.read.parquet(out).count() === 2)
    // second batch arrives; only IT is processed on the next invocation
    Seq((3L, 30.0)).toDF("activity_id", "value")
      .write.mode("append").parquet(src)
    Streams.catchUp(spark, src, chk, out, schema,
      df => df.withColumn("doubled", col("value") * 2))
    val rows = spark.read.parquet(out)
    assert(rows.count() === 3) // no reprocessing of batch 1
    assert(rows.where("activity_id = 3").first().getAs[Double]("doubled") === 60.0)
  }

  test("streaming session windows collapse <=2s-gap events like the batch op") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(3)),  // one session: gaps 1, 2
      (1L, ts(10)), (1L, ts(11)),             // second session
      (2L, ts(5)))                            // separate key
      .toDF("activity_id", "ts")
    // session_window works identically over a batch frame — same operator,
    // batch for assertion simplicity (streaming runtime covered above)
    val sessions = Streams.sessionizeStream(events, "activity_id", "ts")
      .orderBy("activity_id", "session_start").collect()
    assert(sessions.length === 3)
    assert(sessions.map(_.getAs[Long]("n_events")).toSeq === Seq(3L, 2L, 1L))
  }

  test("dedup stream drops exact (key, ts) duplicates") {
    import spark.implicits._
    val events = Seq((1L, ts(0)), (1L, ts(0)), (1L, ts(1)))
      .toDF("activity_id", "ts")
    assert(Streams.dedupStream(events, Seq("activity_id"), "ts").count() === 2)
  }

  test("anti-dedup stream drops docs whose key the seen corpus already has") {
    import spark.implicits._
    val newDocs = Seq((10L, "aa"), (11L, "bb"), (12L, "cc"))
      .toDF("doc_id", "text_sha")
    val seen = Seq(("aa"), ("zz")).toDF("text_sha")
    // stream-static left-outer + null filter — assert on the batch frame
    // (identical operator; the streaming runtime path is the same join)
    val kept = Streams.antiDedupStream(newDocs, seen, "text_sha")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept === Seq(11L, 12L))
    // no residual marker column leaks into the output
    assert(!Streams.antiDedupStream(newDocs, seen, "text_sha")
      .columns.contains("__seen"))
  }

  test("watermarked windowed aggregation folds late rows into their window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val agg = Streams.windowedLoadStream(
      mem.toDF.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", window = "10 seconds", watermark = "30 seconds")
    val q = agg.writeStream.format("memory").queryName("wls")
      .outputMode("complete").start()
    try {
      mem.addData((1L, ts(1), 5.0), (1L, ts(12), 7.0))
      q.processAllAvailable()
      // a LATE row for the first window, still inside the watermark —
      // must fold into the existing window, not open a new one
      mem.addData((1L, ts(3), 2.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT n_events, total, mean FROM wls ORDER BY window_start")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      assert(rows.toSeq === Seq((2L, 7.0, 3.5), (1L, 7.0, 7.0)))
    } finally q.stop()
  }

  test("hopping stream: each event lands in exactly window/slide windows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val agg = Streams.hoppingLoadStream(
      mem.toDF.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", window = "20 seconds", slide = "10 seconds",
      watermark = "1 minute")
    val q = agg.writeStream.format("memory").queryName("hls")
      .outputMode("complete").start()
    try {
      mem.addData((1L, ts(5), 4.0), (1L, ts(12), 6.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, n_events, total FROM hls ORDER BY window_start")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      // ts(5) → windows starting [-10, 0]; ts(12) → [0, 10]: the shared
      // [0, 20) window holds both events, the flanks one each
      assert(rows.map(r => (r._2, r._3)).toSeq ===
        Seq((1L, 4.0), (2L, 10.0), (1L, 6.0)))
      // hop factor 2: total window memberships = 2 · n_events
      assert(rows.map(_._2).sum === 4L)
    } finally q.stop()
  }

  test("stream upsert sink: re-delivered batch overwrites, never duplicates") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-upsert")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    Seq((1L, 1, 10.0), (2L, 1, 20.0)).toDF("activity_id", "seq_no", "value")
      .write.mode("append").parquet(src)
    val schema = StructType(Seq(
      StructField("activity_id", LongType),
      StructField("seq_no", IntegerType),
      StructField("value", DoubleType)))
    def drain(chk: String): Unit =
      Streams.upsertSink(
        spark.readStream.schema(schema).parquet(src), out, chk)
    drain(base.resolve("chk1").toString)
    // simulate an at-least-once REPLAY: a fresh checkpoint re-delivers
    // everything; the partition-overwrite sink must converge, not append
    drain(base.resolve("chk2").toString)
    val rows = spark.read.parquet(out)
    assert(rows.count() === 2)
    assert(rows.where("activity_id = 1").count() === 1)
  }

  test("stream-stream interval join matches within the window only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp)]
    val rMem = MemoryStream[(Long, Timestamp, Double)]
    val joined = Streams.intervalJoinStream(
      lMem.toDF.toDF("activity_id", "l_ts"),
      rMem.toDF.toDF("activity_id", "r_ts", "value"),
      "activity_id", "l_ts", "r_ts", withinSeconds = 5)
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      lMem.addData((1L, ts(0)), (2L, ts(0)))
      rMem.addData(
        (1L, ts(3), 1.0),   // inside [0, 5] -> match
        (1L, ts(9), 2.0),   // outside -> no match
        (3L, ts(1), 3.0))   // wrong key -> no match
      q.processAllAvailable()
      val rows = spark.sql("SELECT activity_id, value FROM ivj").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq === Seq((1L, 1.0)))
    } finally q.stop()
  }

  test("streaming classifier filter keeps exactly the batch query's keep set") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch truth over the real sf0.001 corpus
    val batchKeep = SparkEntry.queries("q_text_clf_score")(spark, sfDir)
      .where(col("keep"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val q = Streams.clfFilterStream(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("clfstream")
      .outputMode("append").start()
    try {
      val (h, t) = docs.splitAt(docs.length / 2)
      mem.addData(h.toSeq); q.processAllAvailable() // two micro-batches:
      mem.addData(t.toSeq); q.processAllAvailable() // stateless ⇒ no carry
      val got = spark.sql("SELECT doc_id, w_sum FROM clfstream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === batchKeep)
    } finally q.stop()
  }

  test("streaming benchmark screen tags exactly the batch bloom-decontamination rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.TextHash._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // benchmark = the batch query's slice (doc_id 10-59) with its
    // distinct shingle hashes + the bloom built over them
    val withHs = Tables.documents(spark, sfDir)
      .withColumn("toks", expr(tokensSpark("text")))
      .withColumn("th", expr(hashArraySpark("toks")))
      .withColumn("hs", expr(shingleHashesSpark("th")))
    val bench = withHs.where(col("doc_id").between(10, 59))
      .select("doc_id", "hs").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toSeq
    val bloom = functions.Bloom.buildFilter(
      withHs.where(col("doc_id").between(10, 59))
        .select(explode(col("hs")).as("hsh")),
      expectedItems = 1L << 16, numBits = 1L << 20)
    val batch = SparkEntry.queries("q_decontaminate_bloom")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val train = Tables.documents(spark, sfDir)
      .where(!col("doc_id").between(10, 59))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val q = Streams.decontaminateStream(
      mem.toDF.toDF("doc_id", "text"), bench, bloom)
      .writeStream.format("memory").queryName("deconstream")
      .outputMode("append").start()
    try {
      val (h, t) = train.splitAt(train.length / 2)
      mem.addData(h.toSeq); q.processAllAvailable() // stateless ⇒ split
      mem.addData(t.toSeq); q.processAllAvailable() // must not matter
      val rows = spark.sql(
        "SELECT doc_id, bench_id, n_shared, contaminated FROM deconstream")
        .collect()
      assert(rows.length === train.length) // every arriving doc is tagged
      val overlapping = rows.filter(_.getLong(2) >= 1)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSet
      assert(overlapping === batch) // same rows, same best bench, same flag
      assert(batch.nonEmpty) // the slice overlaps at sf0.001 — a real pin
    } finally q.stop()
  }

  test("benchmark screen without a bloom fails CLOSED: exact-verifies all") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // bench doc 7 shares the 3-shingle run of "a b c d e"; doc 9 does not.
    // bloom = None with a NON-empty bench must not tag everything clean
    // (ADVICE r8: the old lit(false) pass skipped the verify entirely) —
    // it must pay the exact verify for every document.
    val benchHs = {
      import graft.functions.TextHash._
      Seq("a b c d e").toDF("text")
        .withColumn("toks", expr(tokensSpark("text")))
        .withColumn("th", expr(hashArraySpark("toks")))
        .select(expr(shingleHashesSpark("th")))
        .head().getSeq[Long](0)
    }
    val bench = Seq(7L -> benchHs.toSeq)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.decontaminateStream(
      mem.toDF.toDF("doc_id", "text"), bench, bloom = None, minShared = 3L)
      .writeStream.format("memory").queryName("deconnone")
      .outputMode("append").start()
    try {
      mem.addData(Seq(1L -> "a b c d e f g", 2L -> "x y z w v u t"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, bench_id, n_shared, contaminated FROM deconnone")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          r.getLong(2), r.getBoolean(3))).toSet
      // doc 1 contains the full 5-token run → 3 shared 3-shingles → flagged
      assert(rows.contains((1L, 7L, 3L, true)))
      // doc 2 shares nothing → clean
      assert(rows.exists(r => r._1 == 2L && r._3 == 0L && !r._4))
    } finally q.stop()
  }

  test("funnel stream advances in order across micro-batches = batch funnel") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real sf0.001 events, split mid-stream BY TIME so stage state must
    // survive the micro-batch boundary
    val all = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .sortBy { case (_, id, ts, _) => (ts.getTime, id) }
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val q = Streams.funnelStream(
      mem.toDF.toDF("user_id", "event_id", "ts", "event_type")
        .as[Streams.FunnelEvent])
      .writeStream.format("memory").queryName("funnelstream")
      .outputMode("append").start()
    try {
      val (h, t) = all.splitAt(all.length / 2)
      mem.addData(h.toSeq); q.processAllAvailable()
      mem.addData(t.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT stage, count(*) AS n FROM funnelstream GROUP BY 1")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = SparkEntry.queries("q_event_funnel")(spark, sfDir).collect()
        .map(r => r.getInt(0) -> r.getLong(2)).toMap
      // the stream emits one advance per user per reached stage — its
      // per-stage counts ARE the batch funnel's n_users column
      (1 to 3).foreach { st =>
        assert(got.getOrElse(st, 0L) === want(st), s"stage $st")
      }
    } finally q.stop()
  }

  test("transition stream pairs across micro-batches = batch lead() counts") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real sf0.001 events in (ts, event_id) order, split into three
    // batches so the carried (lastType) state bridges two boundaries
    val all = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .sortBy { case (_, id, ts, _) => (ts.getTime, id) }
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val q = Streams.transitionStream(
      mem.toDF.toDF("user_id", "event_id", "ts", "event_type")
        .as[Streams.TransEvent])
      .writeStream.format("memory").queryName("transstream")
      .outputMode("append").start()
    try {
      val third = all.length / 3
      mem.addData(all.take(third).toSeq); q.processAllAvailable()
      mem.addData(all.slice(third, 2 * third).toSeq); q.processAllAvailable()
      mem.addData(all.drop(2 * third).toSeq); q.processAllAvailable()
      val got = spark.sql(
        "SELECT from_type, to_type, count(*) AS n FROM transstream GROUP BY 1, 2")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = SparkEntry.queries("q_event_transitions")(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === want)
    } finally q.stop()
  }

  test("attribution stream across micro-batches = batch last-touch join") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
      .sortBy { case (_, id, ts, _) => (ts.getTime, id) }
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val q = Streams.attributionStream(
      mem.toDF.toDF("user_id", "event_id", "ts", "event_type")
        .as[Streams.AttrEvent])
      .writeStream.format("memory").queryName("attrstream")
      .outputMode("append").start()
    try {
      val third = all.length / 3
      mem.addData(all.take(third).toSeq); q.processAllAvailable()
      mem.addData(all.slice(third, 2 * third).toSeq); q.processAllAvailable()
      mem.addData(all.drop(2 * third).toSeq); q.processAllAvailable()
      val got = spark.sql(
        "SELECT purchase_id, click_id, gap_s FROM attrstream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = SparkEntry.queries("q_attribution")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      assert(want.nonEmpty) // sf0.001 has real attributed purchases
      assert(got === want)
    } finally q.stop()
  }

  test("attribution stream: same-micros click is attributable, batch-style") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, String)]
    val q = Streams.attributionStream(
      mem.toDF.toDF("user_id", "event_id", "ts", "event_type")
        .as[Streams.AttrEvent])
      .writeStream.format("memory").queryName("attredge")
      .outputMode("append").start()
    try {
      // click id 9 shares the purchase's exact micros; plain (ts, id)
      // processing would see the purchase (id 5) first and credit the
      // stale click id 1 — the batch as-of matches c_us <= p_us, so the
      // same-instant click must win (last-touch: max micros, then max id)
      mem.addData((1L, 1L, ts(1), "click"), (1L, 9L, ts(7), "click"),
        (1L, 5L, ts(7), "purchase"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT purchase_id, click_id, gap_s FROM attredge")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq === Seq((5L, 9L, 0L)))
    } finally q.stop()
  }

  test("personal-record stream: custom state survives micro-batch boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val recs = Streams.personalRecordStream(
      mem.toDF.toDF("user_id", "event_id", "ts", "value")
        .as[Streams.RecordEvent])
    val q = recs.writeStream.format("memory").queryName("prs")
      .outputMode("append").start()
    try {
      // batch 1: first value is always a record; the later higher value
      // too; the dip between them is not. user 2 is independent state.
      mem.addData((1L, 1L, ts(1), 3.0), (1L, 2L, ts(2), 5.0),
        (1L, 3L, ts(3), 4.0), (2L, 4L, ts(1), 9.0))
      q.processAllAvailable()
      // batch 2: 4.9 < the 5.0 best carried in state -> silent;
      // 7.0 beats it -> emitted with prev_best = 5.0
      mem.addData((1L, 5L, ts(10), 4.9), (1L, 6L, ts(11), 7.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, value, prev_best FROM prs ORDER BY user_id, value")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      assert(rows.toSeq === Seq(
        (1L, 3.0, None), (1L, 5.0, Some(3.0)), (1L, 7.0, Some(5.0)),
        (2L, 9.0, None)))
    } finally q.stop()
  }

  test("batch q_record_events emits the same records as the stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Seq(
      (1L, ts(1), 1L, 3.0), (2L, ts(2), 1L, 5.0), (3L, ts(3), 1L, 4.0),
      (4L, ts(10), 1L, 4.9), (5L, ts(11), 1L, 7.0),
      (6L, ts(1), 2L, 9.0), (7L, ts(2), 2L, 8.0),
      // EQUAL timestamps for user 3: the (ts, event_id) order sees 5.0
      // first, so 3.0 is not a record — a value-ordered stream would
      // wrongly emit both (ADVICE r4)
      (8L, ts(5), 3L, 5.0), (9L, ts(5), 3L, 3.0))
    // batch path: same rows as a parquet events table
    val dir = java.nio.file.Files.createTempDirectory("graft-rec").toString
    events.map { case (id, t, u, v) => (id, t, u, "a", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("q_record_events")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value"),
        Option(r.get(r.fieldIndex("prev_best"))).map(_.asInstanceOf[Double])))
      .toSet
    // stream path: same rows through flatMapGroupsWithState
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = Streams.personalRecordStream(
      mem.toDF.toDF("user_id", "event_id", "ts", "value")
        .as[Streams.RecordEvent])
      .writeStream.format("memory").queryName("recpar")
      .outputMode("append").start()
    try {
      events.filter(_._3 != 3L)
        .foreach { case (id, t, u, v) => mem.addData((u, id, t, v)) }
      // the equal-ts pair rides ONE micro-batch, inserted value-ascending:
      // only the (ts, event_id) sort puts the 5.0 record first — a
      // value-ordered or insertion-ordered fold would emit both
      mem.addData((3L, 9L, ts(5), 3.0), (3L, 8L, ts(5), 5.0))
      q.processAllAvailable()
      val stream = spark.sql(
        "SELECT user_id, event_id, value, prev_best FROM recpar")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      assert(batch === stream)
      assert(stream.exists(_._2 == 8L) && !stream.exists(_._2 == 9L))
    } finally q.stop()
  }

  test("LSH dedup stream: bucket claims across micro-batches = batch ranking") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real sf0.001 corpus (it contains genuine near-dup pairs); arrival
    // micros = doc_id so the arrival order is the id order and ties are
    // impossible by construction — tie handling is pinned separately below
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    // batch referee over the SAME band chain: per (g, k) bucket the
    // (micros, doc_id)-first arrival claims it, every later one is a dup
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g", "k").orderBy("micros", "doc_id")
    val want = operators.Dedup.bandKeysFor(
        Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("doc_id").as("micros"), col("text")),
        carry = Seq("micros"))
      .withColumn("first_doc", first("doc_id").over(w))
      .withColumn("dup", col("doc_id") =!= col("first_doc"))
      .select("doc_id", "g", "k", "dup", "first_doc")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getBoolean(3),
        r.getLong(4))).toSet
    val mem = MemoryStream[(Long, Long, String)]
    val q = Streams.lshDedupStream(
        mem.toDF.toDF("doc_id", "micros", "text"))
      .writeStream.format("memory").queryName("lshstream")
      .outputMode("append").start()
    try {
      val third = docs.length / 3
      mem.addData(docs.take(third).toSeq); q.processAllAvailable()
      mem.addData(docs.slice(third, 2 * third).toSeq); q.processAllAvailable()
      mem.addData(docs.drop(2 * third).toSeq); q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, g, k, dup, first_doc FROM lshstream").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getBoolean(3),
          r.getLong(4))).toSet
      assert(got === want)
      // the corpus genuinely exercises both verdicts
      assert(got.exists(_._4) && got.exists(!_._4))
      // doc-level rollup: near-dup iff ANY band collided — and every
      // batch near-dup candidate pair's b-side doc is flagged
      val dupDocs = got.collect { case (id, _, _, true, _) => id }
      val candB = SparkEntry.queries("q_dedup_minhash_pairs")(spark, sfDir)
        .collect().map(_.getLong(1)).toSet
      assert(candB.forall(dupDocs.contains),
        "a batch LSH candidate pair's later doc was not flagged by the stream")
    } finally q.stop()
  }

  test("LSH dedup stream: same-micros tie inside one batch goes to lower id") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val mem = MemoryStream[(Long, Long, String)]
    val q = Streams.lshDedupStream(
        mem.toDF.toDF("doc_id", "micros", "text"))
      .writeStream.format("memory").queryName("lshtie")
      .outputMode("append").start()
    try {
      // identical text, identical micros, one micro-batch, higher id first
      mem.addData(Seq((7L, 100L, text), (3L, 100L, text)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, dup, first_doc FROM lshtie")
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      assert(rows.forall { case (id, dup, f) => f == 3L && dup == (id != 3L) })
      // a later batch arrival into the same buckets is a dup of the claimer
      mem.addData(Seq((1L, 200L, text))); q.processAllAvailable()
      val later = spark.sql(
        "SELECT DISTINCT dup, first_doc FROM lshtie WHERE doc_id = 1")
        .collect().map(r => (r.getBoolean(0), r.getLong(1)))
      assert(later.toSeq === Seq((true, 3L)),
        "cross-batch arrival must defer to the established claim, id order notwithstanding")
    } finally q.stop()
  }

  private def ts(s: Int): Timestamp = new Timestamp(1700000000000L + s * 1000L)
}
