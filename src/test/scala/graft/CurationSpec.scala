package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Curation pipeline composition: every stage must claim its doc in
  * priority order (exact_dup > near_dup > rule > contaminated > kept) on
  * a corpus built to trigger each one.
  */
class CurationSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-curation").toString
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val good = "the quick brown fox jumps over the lazy dog and runs off to the hills again"
    val near = "the quick brown fox leaps over the lazy dog and runs off to the hills again"
    // long doc embedding the benchmark: >= 3 shared shingles but low
    // jaccard vs doc 0 (it is mostly other text), so decon catches it
    // and the near-dup stage does not
    val leaky = s"$bench and then a very long tail of unrelated words " +
      "stretching the union far beyond the shared part so that the " +
      "jaccard similarity of the pair stays well below the threshold"
    val docs = Seq(
      (0L, bench, "en", "bench"),
      (10L, good, "en", "s"), // canonical: kept
      (11L, good, "en", "s"), // exact copy -> exact_dup
      (12L, near, "en", "s"), // one token changed -> near_dup
      (13L, "tiny text", "en", "s"), // -> too_short
      (14L, leaky, "en", "s"), // -> contaminated
      (15L, "the simple and honest report of the day is that all of it went fine", "en", "s"))
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq((0L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("each stage claims its document in priority order") {
    val st = operators.Curation.statuses(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st(10L) === "kept")
    assert(st(11L) === "exact_dup")
    assert(st(12L) === "near_dup")
    assert(st(13L) === "too_short")
    assert(st(14L) === "contaminated")
    assert(st(15L) === "kept")
  }

  test("report aggregates the same statuses") {
    val rep = SparkEntry.queries("q_curation_report")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val st = operators.Curation.statuses(spark, dir).collect()
      .map(_.getString(1)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rep === st)
  }
}
