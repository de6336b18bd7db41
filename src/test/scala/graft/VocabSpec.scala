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
