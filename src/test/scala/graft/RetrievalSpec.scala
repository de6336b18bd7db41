package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** BM25 semantics on a hand-built corpus — covers what the oracle can't:
  * the scorer's ordering properties (tf saturation, idf weighting, length
  * normalization), not just cross-engine arithmetic parity.
  */
class RetrievalSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-bm25").toString
    // 'data'/'join' are corpus-common; 'dup' is rare (idf signal).
    // Docs 0/1: same length, doc 1 adds the rare term.
    // Docs 2/3: same tf of 'dup', doc 3 is much longer (length penalty).
    val docs = Seq(
      (0L, "data join feeds the wide table pipeline stage", "en", "s"),
      (1L, "data join dup feeds the wide table pipeline", "en", "s"),
      (2L, "dup dup cleanup pass", "en", "s"),
      (3L, "dup dup cleanup pass over many many many extra padding tokens " +
        "stretching the document length far beyond the corpus average", "en", "s"),
      (4L, "data data data data data data data data data data", "en", "s"),
      (5L, "nothing relevant here at all whatsoever", "en", "s"),
      // matched pair for the idf assertion: same length, same tf=1, the
      // only difference is WHICH term — plus filler docs that push
      // df(data)=6 > df(dup)=4 so 'data' really is the common term
      (6L, "dup alpha beta gamma", "en", "s"),
      (7L, "data alpha beta gamma", "en", "s"),
      (8L, "data omega one two", "en", "s"),
      (9L, "data omega three four", "en", "s"))
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val scores: Map[Long, Double] =
    SparkEntry.queries("q_bm25_rank")(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap

  test("rare term outweighs common terms; zero-hit docs are absent") {
    assert(!scores.contains(5L)) // no query term at all
    assert(scores(1L) > scores(0L)) // adds the rare 'dup' at equal length
    // matched pair: equal length, equal tf=1 — the rare term's idf wins
    assert(scores(6L) > scores(7L))
  }

  test("length normalization: same tf, longer doc scores lower") {
    assert(scores(2L) > scores(3L))
  }

  test("tf saturation: 10x tf of a common term stays bounded (k1 cap)") {
    // doc 4 has tf=10 of 'data' vs doc 0's tf=1 — BM25's saturation keeps
    // the ratio under (k1+1) even before length effects
    assert(scores(4L) < scores(0L) * 2.2)
  }

  test("LM score: corpus-typical text outscores one-off gibberish") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, length}
    import spark.implicits._
    val d = Files.createTempDirectory("graft-lm").toString
    // docs 0-3 share the same phrasing (frequent bigrams); doc 4 is made
    // of bigrams that occur exactly once in the corpus
    val docs = (0L to 3L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog", "en", "s")) :+
      ((4L, "zephyr quokka librates ontic marzipan gyre", "en", "s"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val scores = SparkEntry.queries("q_text_lm_score")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(scores(0L)._1 === 8L) // 9 tokens -> 8 bigrams
    assert(scores(4L)._1 === 5L)
    assert(scores(0L)._2 > scores(4L)._2, s"typical ${scores(0L)} vs rare ${scores(4L)}")
  }

  test("top-K LM: oversized K reproduces the full model; K=1 exercises misses") {
    val full = SparkEntry.queries("q_text_lm_score")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val bigK = operators.TextOps.lmTopKScores(spark, dir, 100000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    bigK.foreach { case (id, nb, nh, avg) =>
      assert(nh === nb) // every bigram hits an un-truncated model
      assert((nb, avg) === full(id))
    }
    // K=1 keeps only ('data','data') (n2=9, the unique max): truncation
    // can only LOWER smoothed probabilities — strictly when a doc misses
    val k1 = operators.TextOps.lmTopKScores(spark, dir, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    k1.foreach { case (id, nb, nh, avg) =>
      if (nh < nb) assert(avg < full(id)._2)
      else assert(avg === full(id)._2)
    }
    assert(k1.exists { case (_, nb, nh, _) => nh < nb })
    assert(k1.exists { case (_, _, nh, _) => nh > 0 })
  }

  test("top-K LM miss path scores exactly the n2=0 smoothed default") {
    import graft.functions.TextHash
    // doc 5's tokens appear nowhere else, so at K=1 every bigram misses
    // with first-word unigram count 1: avg_logp = ln(1/(1+|V|)), |V| =
    // distinct first-words corpus-wide (recomputed here independently)
    val v = Tables.documents(spark, dir)
      .withColumn("toks", expr(TextHash.tokensSpark("text")))
      .where(size(col("toks")) >= 2)
      .select(explode(expr("slice(toks, 1, size(toks) - 1)")).as("w1"))
      .agg(countDistinct("w1")).head.getLong(0)
    val d5 = operators.TextOps.lmTopKScores(spark, dir, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .find(_._1 == 5L).get
    assert(d5._3 === 0L) // zero hits
    assert(math.abs(d5._4 - math.log(1.0 / (1 + v))) < 1e-6)
  }

  test("DSIR weight separates the target domain from the rest") {
    // the importance weight is a domain-match ranking signal: target-slice
    // docs must average strictly higher than the rest of the corpus, and
    // a weight of ~0 means corpus-typical
    val rows = SparkEntry.queries("q_dsir_weight")(spark, sfDir).collect()
      .map(r => (r.getString(1) == "src0", r.getDouble(3)))
    val (target, rest) = rows.partition(_._1)
    assert(target.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[(Boolean, Double)]) = xs.map(_._2).sum / xs.length
    assert(mean(target) > mean(rest),
      s"target mean ${mean(target)} should exceed non-target ${mean(rest)}")
  }

  test("ranks are contiguous and ordered by (score desc, doc_id)") {
    val rows = SparkEntry.queries("q_bm25_rank")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === (1 to rows.length))
    val resorted = rows.sortBy { case (_, id, s) => (-s, id) }
    assert(resorted.toSeq === rows.toSeq)
  }

  test("curriculum tiers: monotone difficulty envelopes, counts cover corpus") {
    val tiers = SparkEntry.queries("q_curriculum")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(tiers.map(_._1).toSeq === (1 to 5))
    val scored = SparkEntry.queries("q_text_lm_score")(spark, sfDir).count()
    assert(tiers.map(_._2).sum === scored)
    tiers.foreach { case (t, _, _, easiest, hardest, mean) =>
      assert(easiest >= hardest, s"tier $t")
      assert(mean <= easiest + 1e-9 && mean >= hardest - 1e-9, s"tier $t")
    }
    // tier k's hardest doc is still no harder than tier k+1's easiest
    tiers.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 >= b._4, s"tiers ${a._1}->${b._1} overlap the wrong way")
    }
  }

  test("curriculum remainder path: 8 docs tile 2/2/2/1/1 like ntile(5)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, length}
    import spark.implicits._
    // ntile sizes depend only on n: 8 docs -> the first 8%5=3 tiers get
    // ceil(8/5)=2 docs, the last two get 1 — exercises the closed-form
    // rank→tier expression off the divisible-by-5 happy path
    val d = Files.createTempDirectory("graft-ntile").toString
    (1 to 8).map(i => (i.toLong, s"w$i a b c", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val tiers = SparkEntry.queries("q_curriculum")(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(tiers.toSeq === Seq((1, 2L), (2, 2L), (3, 2L), (4, 1L), (5, 1L)))
  }

  test("phrase search: adjacency and order are load-bearing, matches count") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, length}
    import spark.implicits._
    val d = Files.createTempDirectory("graft-phrase").toString
    val docs = Seq(
      (0L, "part filter scan x part filter scan", "en", "s"), // 2 matches
      (1L, "part filter x scan", "en", "s"), // gap breaks adjacency
      (2L, "scan filter part", "en", "s"), // order matters
      (3L, "x y part filter scan", "en", "s"), // 1 match at pos 3
      (4L, "part filter", "en", "s")) // too short for the phrase
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q_phrase_search")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(0L -> ((2L, 1L)), 3L -> ((1L, 3L))))
  }

  test("classifier score is the exact mean bucket weight; keep = score > 0") {
    import graft.functions.TextHash
    // independent re-derivation: polyHash fold -> bucket -> weight
    def poly(tok: String): Long =
      tok.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % TextHash.P)
    val rows = SparkEntry.queries("q_text_clf_score")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byId.foreach { case (id, (n, wSum, score, keep)) =>
      val toks = docs(id).trim.split("\\s+").filter(_.nonEmpty)
      val expect: Long = toks.map(t =>
        operators.TextOps.clfWeights((poly(t) % 64).toInt)).sum
      assert(toks.length.toLong === n)
      assert(expect === wSum, s"doc $id")
      assert(score === wSum.toDouble / n)
      assert(keep === (wSum > 0))
    }
    // the lattice splits the corpus: both classes must be populated
    assert(byId.values.exists(_._4) && byId.values.exists(!_._4))
  }

  test("hybrid RRF fusion: ranks reconstruct the score, both rankers count") {
    val rows = SparkEntry.queries("q_hybrid_rank")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq === (1 to rows.length))
    rows.foreach { case (_, id, br, dr, rrf) =>
      assert(br.nonEmpty || dr.nonEmpty, s"doc $id in neither ranking")
      val expect = br.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dr.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-12, s"doc $id")
    }
    // fused order is non-increasing in rrf
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 >= b._5)
      case _ =>
    }
    // at least one doc must be surfaced by each ranker (fusion is real)
    assert(rows.exists(_._3.nonEmpty) && rows.exists(_._4.nonEmpty))
  }

  test("token chunking: stride/overlap cover every token, tail rule holds") {
    val chunks = SparkEntry.queries("q_doc_chunks")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(chunks.nonEmpty)
    val nToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr(s"size(${graft.functions.TextHash.tokensSpark("text")})"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = nToks(id)
      val sorted = cs.sortBy(_._3)
      // first chunk anchors at 1; starts advance by the 24-token stride
      assert(sorted.head._3 === 1L, s"doc $id")
      sorted.foreach { case (_, idx, start, len, _) =>
        assert(start === 1L + 24L * idx, s"doc $id")
        assert(len === math.min(32L, n - start + 1L), s"doc $id")
        assert(len >= 8L || cs.length == 1, s"doc $id tail rule")
      }
      // coverage: consecutive chunks overlap (no token gap up to the tail)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 <= a._3 + a._4, s"doc $id gap")
        case _ =>
      }
      // every token beyond the last chunk's end was legally dropped (< 8)
      val lastEnd = sorted.last._3 + sorted.last._4 - 1
      assert(n - lastEnd < 8, s"doc $id dropped a full-size tail")
    }
  }

  test("source cap keeps at most 10 per source, ranked by score then id") {
    val rows = SparkEntry.queries("q_source_cap")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(rows.nonEmpty)
    val scores = SparkEntry.queries("q_text_clf_score")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (src, kept) =>
      assert(kept.length <= 10, src)
      assert(kept.map(_._2).sorted.toSeq === (1 to kept.length), src)
      // the kept set IS the source's top-|kept| by (score desc, doc_id)
      val expect = scores.collect { case (id, sc) if srcOf(id) == src => (id, sc) }
      val top = expect.sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
      assert(kept.map(_._3).toSet === top, src)
    }
  }

  private lazy val srcOf: Map[Long, String] =
    Tables.documents(spark, TestSession.sfDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
}
