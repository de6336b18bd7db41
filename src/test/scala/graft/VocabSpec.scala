package graft

import org.apache.spark.sql.functions._

/** Vocabulary/OOV/scrub operators: the Zipf report must agree with a
  * brute-force recount, OOV rates must be exact fractions, and masking
  * must leave no digit behind.
  */
class VocabSpec extends SparkSpec {

  test("vocab zipf: ranks are dense and the top token is the true argmax") {
    val rows = SparkEntry.queries("q_vocab_zipf")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length).toSeq)
    // brute-force recount of the top token
    val brute = Tables.documents(spark, sfDir)
      .select(explode(expr(graft.functions.TextHash.tokensSpark("text"))).as("tok"))
      .groupBy("tok").count()
      .orderBy(desc("count"), asc("tok")).limit(1).collect()(0)
    assert(rows(0).getAs[String]("tok") === brute.getAs[String]("tok"))
    assert(rows(0).getAs[Long]("cnt") === brute.getAs[Long]("count"))
    // counts are non-increasing in rank; shares in (0, 1]
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    assert(rows.forall { r =>
      val s = r.getAs[Double]("share"); s > 0.0 && s <= 1.0
    })
  }

  test("oov rate: exact fraction, zero for a doc made of vocab heads") {
    val rows = SparkEntry.queries("q_oov_rate")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val o = r.getAs[Long]("n_oov")
      assert(o >= 0 && o <= n)
      assert(r.getAs[Double]("oov_rate") === o.toDouble / n)
    }
    // corpus is drawn from a ~40-word pool; with a 20-token vocab the
    // mean OOV rate must be strictly between 0 and 1 (both tails hit)
    val mean = rows.map(_.getAs[Double]("oov_rate")).sum / rows.length
    assert(mean > 0.0 && mean < 1.0)
  }

  test("vocab growth: deciles complete, cumulative, ending at the true vocab size") {
    val rows = SparkEntry.queries("q_vocab_growth")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    val sizes = rows.map(_.getAs[Long]("vocab_size"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a <= b }) // monotone
    val trueVocab = Tables.documents(spark, sfDir)
      .select(explode(expr(graft.functions.TextHash.tokensSpark("text"))).as("tok"))
      .distinct().count()
    assert(sizes.last === trueVocab)
    assert(rows.map(_.getAs[Long]("new_tokens")).sum === trueVocab)
  }

  test("trimmed mean: bounded by the band and insensitive to one huge spike") {
    val rows = SparkEntry.queries("q_trimmed_mean")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tm = r.getAs[Double]("trimmed_mean")
      assert(tm >= r.getAs[Double]("p05") && tm <= r.getAs[Double]("p95"))
      assert(r.getAs[Long]("n_kept") >= 1L)
    }
  }

  test("winsorize: values clipped into the band, row count preserved") {
    val rows = SparkEntry.queries("q_winsorize")(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.length.toLong === nEvents) // transform keeps every row
    // every clamped row sits exactly on a bound; kept rows are inside
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rs =>
      val vals = rs.map(_.getAs[Double]("w_value"))
      val lo = vals.min; val hi = vals.max
      rs.foreach { r =>
        val v = r.getAs[Double]("w_value")
        assert(v >= lo && v <= hi)
        if (r.getAs[String]("clamp") == "low") assert(v === lo)
        if (r.getAs[String]("clamp") == "high") assert(v === hi)
      }
    }
    assert(rows.exists(_.getAs[String]("clamp") != "kept")) // tails exist
  }

  test("source quality: rollup matches the doc-level filter report") {
    val rows = SparkEntry.queries("q_source_quality")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    val keptDocs = SparkEntry.queries("q_text_filter_report")(spark, sfDir)
      .where(col("rule_reason") === "kept")
      .collect().map(_.getAs[Long]("n_docs")).sum
    assert(rows.map(_.getAs[Long]("n_kept")).sum === keptDocs)
    rows.foreach { r =>
      val rate = r.getAs[Double]("kept_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate === r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_docs"))
    }
  }

  test("lang confusion: cells sum to the corpus and agree with the per-doc classifier") {
    val cells = SparkEntry.queries("q_lang_confusion")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(cells.map(_.getAs[Long]("n")).sum === nDocs)
    // diagonal-mass parity with q_text_langid's per-doc is_match
    val matches = SparkEntry.queries("q_text_langid")(spark, sfDir)
      .where(col("is_match")).count()
    val diag = cells.filter(r =>
      r.getAs[String]("lang") == r.getAs[String]("predicted"))
      .map(_.getAs[Long]("n")).sum
    assert(diag === matches)
  }

  test("kl drift: non-negative everywhere, zero for a corpus-identical source") {
    val rows = SparkEntry.queries("q_kl_drift")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("kl_divergence") >= 0.0, // Gibbs' inequality
        s"negative KL for ${r.getAs[String]("source")}")
    }
    // single-source corpus: P_source == P_corpus -> KL exactly 0
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kl").toString
    Seq((1L, "a b c a", "en", "only", 7L), (2L, "b c", "en", "only", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val solo = SparkEntry.queries("q_kl_drift")(spark, dir).collect()
    assert(solo.length === 1 && solo(0).getAs[Double]("kl_divergence") === 0.0)
  }

  test("outlier mad: spike flagged, constant series yields zero outliers") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    // user 1: tight cluster + one huge spike; user 2: constant (MAD 0)
    val normal = (0 until 20).map(i => (i.toLong, t(i), 1L, "a", 10.0 + (i % 3), "{}"))
    val spike = Seq((20L, t(20), 1L, "a", 1000.0, "{}"))
    val const = (0 until 5).map(i => (30L + i, t(i), 2L, "a", 7.0, "{}"))
    (normal ++ spike ++ const)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_outlier_mad")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("mad"), r.getAs[Long]("n_outliers"))).toMap
    assert(got(1L)._2 === 1L) // exactly the spike
    assert(got(2L) === ((0.0, 0L))) // zero MAD, no div-by-zero, no outliers
  }

  test("scrub mask: output carries no digits and counts every masked run") {
    val rows = SparkEntry.queries("q_scrub_mask")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[String]("masked")
      assert(!m.exists(_.isDigit), s"unmasked digit in: $m")
      assert(r.getAs[Long]("n_masked") ===
        "<NUM>".r.findAllIn(m).length.toLong)
    }
  }
}
