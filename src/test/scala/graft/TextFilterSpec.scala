package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Curation filter pipeline: fixed-order rules, FIRST-MATCH reject reason. */
class TextFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-filter").toString
    val filler = "the of and to in that it is was for on are as with they at " * 3
    val docs = Seq(
      // long enough, token-rich, stopword-balanced -> kept
      (0L, s"a good document $filler about many different things entirely"),
      // < 50 chars -> too_short (even though also token-poor)
      (1L, "tiny text"),
      // >= 50 chars but < 10 tokens -> too_few_tokens
      (2L, "supercalifragilistic expialidocious pneumonoultramicroscopic volcanoconiosis antidisestablishmentarianism floccinaucinihilipilification"),
      // no stopwords at all -> low_stopword
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"),
      // stopword-fine but punctuation-heavy -> high_punct
      (4L, s"$filler ,,,,..... ;;;;; !!!!! ????? ..... ,,,,, ;;;;; !!!!! ????? ..... ,,,,,"),
      // one token repeated -> repetitive (needs >=10 tokens, stopword ok)
      (5L, s"the the the the the the the the the the the the word word"))
      .toDF("doc_id", "text")
    docs.withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("each rule fires on its construction, in fixed order") {
    val rows = SparkEntry.queries("q_text_filter_report")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map(
      "kept" -> 1L, "too_short" -> 1L, "too_few_tokens" -> 1L,
      "low_stopword" -> 1L, "high_punct" -> 1L, "repetitive" -> 1L))
  }
}
