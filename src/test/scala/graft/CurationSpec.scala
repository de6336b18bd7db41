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

  // separate corpus for the packing/repetition/trim operators so the
  // pipeline-status corpus above keeps its carefully balanced statuses
  private lazy val packDir: String = {
    val d = Files.createTempDirectory("graft-pack").toString
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam", "en", "a"), // pure loop
      (2L, "the quick brown fox jumps over the lazy dog and runs off to the hills again", "en", "a"),
      (3L, "one two three four five six seven eight nine ten", "en", "b"),
      (4L, "eleven twelve thirteen fourteen", "en", "b"),
      (5L, "go stop go stop go stop go stop", "en", "b")) // looping bigrams
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq((0L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("repetition signals: loops flagged, prose not") {
    val rep = SparkEntry.queries("q_text_repetition")(spark, packDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(rep(1L) === ((1.0, 1.0, true))) // one token, one bigram
    assert(!rep(2L)._3) // natural prose: top word 'the' 3/16, bigrams distinct
    // "go stop" x4: top word 4/8 = 0.5, top bigram "go stop" 4/7
    assert(rep(5L)._1 === 0.5)
    assert(rep(5L)._3)
  }

  test("sequence packing: running offsets chunk the per-source token stream") {
    val rows = SparkEntry.queries("q_pack_sequences")(spark, packDir).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // per source, start_tok = sum of the preceding docs' n_tokens (doc_id order)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, _, nTok, start, seqId, off) =>
        assert(start === cum)
        assert(seqId === start / 256 && off === start % 256)
        cum += nTok
      }
    }
    // cross-source independence: every source starts its own stream at 0
    assert(rows.filter(_._4 == 0L).map(_._1).toSet === Set("a", "b"))
  }

  test("quantile trim: bands partition each source and bound the tails") {
    val rows = SparkEntry.queries("q_quantile_trim")(spark, packDir).collect()
    val total = rows.map(r => r.getLong(3) + r.getLong(4) + r.getLong(5)).sum
    assert(total === 5L) // every doc lands in exactly one band
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2)) // p05 <= p95
      // trimming never drops more than the two extreme ranks per side
      assert(r.getLong(3) <= 1 && r.getLong(4) <= 1)
    }
  }

  test("split assign: near-dup pairs never straddle a split boundary") {
    val rows = SparkEntry.queries("q_split_assign")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong === nDocs) // every doc gets a split
    val split = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
    assert(pairs.nonEmpty) // the check is vacuous without dup pairs
    pairs.foreach { p =>
      val a = p.getAs[Long]("a_id"); val b = p.getAs[Long]("b_id")
      assert(split(a) === split(b),
        s"pair ($a, $b) split across ${split(a)}/${split(b)}")
    }
    // all three splits actually materialize on this corpus
    assert(rows.map(_.getAs[String]("split")).toSet === Set("train", "val", "test"))
  }

  test("jaccard histogram: bands partition the pair set above the threshold") {
    val rows = SparkEntry.queries("q_jaccard_hist")(spark, sfDir).collect()
    val nPairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === nPairs)
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      assert(b >= 0L && b <= 9L)
      assert(r.getAs[Double]("lo") >= 0.5 && r.getAs[Double]("hi") <= 1.0)
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
    }
  }

  test("dup degree: handshake sum equals twice the pair count") {
    val rows = SparkEntry.queries("q_dup_degree")(spark, sfDir).collect()
    val nPairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
    val handshake = rows.map(r =>
      r.getAs[Long]("degree") * r.getAs[Long]("n_docs")).sum
    assert(handshake === 2 * nPairs)
    assert(rows.forall(_.getAs[Long]("degree") >= 1L))
  }

  test("source overlap: cells are canonically ordered and count every pair") {
    val rows = SparkEntry.queries("q_source_overlap")(spark, sfDir).collect()
    val nPairs = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === nPairs)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") <= r.getAs[String]("source_b"))
      val j = r.getAs[Double]("max_jaccard")
      assert(j >= 0.5 && j <= 1.0) // pairs exist only at/above threshold
    }
  }

  test("budget select: a tight rank-order prefix under the token budget") {
    import graft.functions.TextHash
    // referee ranking computed independently of the distributed prefix sum
    val ranked = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr(TextHash.tokensSpark("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"),
        size(array_distinct(col("toks"))).cast("long").as("dv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, dv) => (-dv, id) }
    val wantIds = ranked.scanLeft((0L, 0L)) { case ((_, acc), (id, n, _)) =>
      (id, acc + n)
    }.drop(1).takeWhile(_._2 <= operators.Curation.TokenBudget)
      .map(_._1).toSet
    val got = SparkEntry.queries("q_budget_select")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.map(_._1).toSet === wantIds)
    assert(got.nonEmpty && got.map(_._2).max <= operators.Curation.TokenBudget)
    // tightness: the next-ranked excluded doc would overflow the budget
    val nextIdx = wantIds.size
    if (nextIdx < ranked.length) {
      val spent = got.map(_._2).max
      assert(spent + ranked(nextIdx)._2 > operators.Curation.TokenBudget)
    }
  }

  test("shard hash is exact for adversarial corpus-scale ids (no overflow)") {
    import spark.implicits._
    // ids near Long.MaxValue would wrap under a naive id*2654435761 in
    // Spark while DuckDB widens to int128 — pre-reducing mod P makes the
    // product bounded, so both engines compute the SAME mathematical
    // value: verify Spark against exact BigInt arithmetic
    val ids = Seq(Long.MaxValue, Long.MaxValue - 1, 4000000000L,
      9000000000000000000L, 1234567890123456789L, 42L)
    val p = BigInt(1000000007L)
    val want = ids.map(id =>
      (((BigInt(id) mod p) * BigInt(2654435761L)) mod p mod 16).toLong)
    val got = ids.toDF("doc_id")
      .select(expr(
        "(((doc_id % 1000000007) * 2654435761) % 1000000007) % 16")
        .as("shard"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === want)
  }
}
