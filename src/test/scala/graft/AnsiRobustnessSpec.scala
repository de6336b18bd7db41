package graft

import graft.operators.{Aggregates, Windows}
import org.apache.spark.sql.functions._

/** Degenerate-input behaviour under ANSI mode (Spark 4 default): every
  * data-derived denominator must yield NULL like DuckDB's native /0 —
  * never a DIVIDE_BY_ZERO crash. At 100 TB a zero-variance partition, an
  * all-zero half, or a zero-norm vector WILL occur.
  */
class AnsiRobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("session runs with ANSI enabled (the mode these guards exist for)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
  }

  test("conditional halves: all-zero first half -> null decoupling, no crash") {
    val ts0 = new java.sql.Timestamp(1700000000000L)
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val df = Seq(
      ("a", ts0, 0.0), ("a", ts(1), 0.0), // first half all zero
      ("a", ts(100), 5.0), ("a", ts(101), 6.0))
      .toDF("k", "ts", "v")
    val row = Aggregates.conditionalHalves(df, "k", "ts", "v").head()
    assert(row.isNullAt(row.fieldIndex("decoupling_pct")))
  }

  test("zscore outliers: constant partition yields no rows, no crash") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 9.0))
      .toDF("k", "v")
    val out = Windows.zscoreOutliers(df, "k", "v", 0.5).collect()
    assert(out.forall(_.getAs[String]("k") == "b"))
  }

  test("cv: zero-mean group -> null, not crash") {
    val df = Seq(("g", -1.0), ("g", 1.0)).toDF("k", "v")
    val row = Aggregates.cvRobust(df, "k", "v").head()
    assert(row.isNullAt(row.fieldIndex("cv")))
  }

  test("corr matrix: zero-variance column -> null r, not crash") {
    val df = Seq((1.0, 5.0, 1.0), (2.0, 5.0, 2.0), (3.0, 5.0, 3.0))
      .toDF("a", "b", "c")
    val rows = graft.operators.Stats.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows(("a", "b")) === None)      // b is constant
    assert(rows(("b", "c")) === None)
    assert(rows(("a", "c")) === Some(1.0)) // c = a exactly
  }

  test("weighted avg: all-zero weights -> null") {
    val df = Seq(("g", 10.0, 0.0), ("g", 20.0, 0.0)).toDF("k", "m", "w")
    val row = Aggregates.weightedAvg(df, "k", "m", "w").head()
    assert(row.isNullAt(row.fieldIndex("weighted_v")))
  }

  test("histogram: constant column does not crash") {
    val df = Seq.fill(5)(42.0).toDF("v")
    val rows = Aggregates.histogram(df, "v", 10).collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum === 5L)
  }

  test("share of total: zero total -> null pct") {
    val df = Seq(("a", 0.0), ("b", 0.0)).toDF("k", "v")
    val rows = Aggregates.shareOfTotal(df, "k", "v").collect()
    assert(rows.forall(_.isNullAt(2)))
  }

  test("connected components on an empty edge list -> empty, no crash") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(operators.GraphOps.connectedComponents(edges, "a", "b").count() === 0L)
  }

  test("degenerate corpora: BM25 / LM / mixture neither crash nor divide") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft-ansi").toString
    // all-empty texts: avgdl = 0 (the CASE guard's worst case), no
    // bigrams, no recipe domains present
    Seq((1L, "", "en", "zz"), (2L, "  ", "en", "zz"), (3L, "one", "en", "zz"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(SparkEntry.queries("q_bm25_rank")(spark, d).count() === 0L)
    assert(SparkEntry.queries("q_text_lm_score")(spark, d).count() === 0L)
    assert(SparkEntry.queries("q_sample_mixture")(spark, d).count() === 0L)
  }

  test("empty corpus: vocab / OOV / KL / splits / overlap all yield empty") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft-ansi-empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq("q_vocab_zipf", "q_oov_rate", "q_kl_drift", "q_split_assign",
      "q_source_overlap", "q_mixture_temperature").foreach { q =>
      assert(SparkEntry.queries(q)(spark, d).count() === 0L, q)
    }
  }

  test("degenerate corpora: chunker / classifier / phrase / curriculum / cap") {
    import java.nio.file.Files
    // whitespace-only and single-token docs: no full-size chunk, no
    // bigram, no phrase window — everything degrades to empty or 1 row
    val d = Files.createTempDirectory("graft-ansi-r5").toString
    Seq((1L, "", "en", "zz"), (2L, "   ", "en", "zz"), (3L, "one", "en", "zz"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(SparkEntry.queries("q_phrase_search")(spark, d).count() === 0L)
    assert(SparkEntry.queries("q_curriculum")(spark, d).count() === 0L)
    // doc 3 has one token: one chunk of length 1, one classifier row
    val chunks = SparkEntry.queries("q_doc_chunks")(spark, d).collect()
    assert(chunks.length === 1)
    assert(chunks.head.getLong(0) === 3L && chunks.head.getLong(3) === 1L)
    val clf = SparkEntry.queries("q_text_clf_score")(spark, d).collect()
    assert(clf.map(_.getLong(0)).toSeq === Seq(3L))
    val cap = SparkEntry.queries("q_source_cap")(spark, d).collect()
    assert(cap.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("zz", 3L)))
  }

  test("single-source corpus: temperature mixture degenerates to identity") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft-ansi-mono").toString
    Seq((1L, "a b", "en", "only", 3L), (2L, "c d", "en", "only", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = SparkEntry.queries("q_mixture_temperature")(spark, d).head()
    assert(r.getAs[Double]("w_temp") === 1.0)
    assert(r.getAs[Double]("boost") === 1.0)
    assert(r.getAs[Long]("quota") === 2L)
  }
}
