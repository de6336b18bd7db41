package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Dedup semantics on a hand-built corpus with known duplicates — covers
  * what the DuckDB oracle cannot: recall against ground truth (the oracle
  * mirrors the blocking, so it would agree with a blocking bug).
  */
class DedupSpec extends SparkSpec {

  /** Writes a tiny documents.parquet + embeddings.parquet into a temp dir
    * shaped like the driver testdata, so operators run unmodified.
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dedup").toString
    val docs = Seq(
      // 0 and 1: identical; 2: near-dup of 0 (one token changed); 3: unrelated
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en", "s0"),
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "s0"),
      (2L, "the quick brown fox leaps over the lazy dog again and again", "en", "s1"),
      (3L, "completely different content with no overlap whatsoever here now", "en", "s1"))
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0), // near 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1))
    embs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("exact dedup keeps the lowest id and counts copies") {
    val rows = run("q_dedup_exact").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("ngram jaccard finds identical and near-dup pairs, skips unrelated") {
    val pairs = run("q_dedup_ngram").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.keySet === Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(pairs((0L, 1L)) === 1.0) // identical text
    assert(pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
  }

  test("dup clusters: transitive closure over pairs, canonical = min id") {
    // pairs on this corpus: (0,1) (0,2) (1,2) -> one cluster {0,1,2};
    // doc 3 has no pair and stays out
    val rows = run("q_dedup_cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.toSeq === Seq(
      (0L, 0L, 3L, true), (1L, 0L, 3L, false), (2L, 0L, 3L, false)))
  }

  test("copy-span pairs: a shared 10-token span links docs; shorter overlap doesn't") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-span").toString
    val span = "one two three four five six seven eight nine ten eleven"
    val docs = Seq(
      (1L, s"left context then $span closing words here", "en", "s"),
      (2L, s"totally different opening but $span and another tail", "en", "s"),
      // shares only 6 consecutive tokens with the span -> no 10-window
      (3L, "one two three four five six with a fresh continuation of text", "en", "s"),
      (4L, "no overlap at all in this document body", "en", "s"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = SparkEntry.queries("q_dedup_span")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) === 2L) // 11-token shared span = two 10-windows
  }

  test("decontamination flags benchmark-overlapping docs, skips clean ones") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-decon").toString
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, bench, "en", "bench"), // the eval set (doc_id < 10)
      // 10: verbatim leak of the benchmark; 11: shares one 3-gram only;
      // 12: clean
      (10L, s"prefix words then $bench and a suffix", "en", "s"),
      (11L, "alpha beta gamma completely different tail content here", "en", "s"),
      (12L, "nothing in common with the held out evaluation data", "en", "s"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq((0L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = SparkEntry.queries("q_text_decontaminate")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(rows(10L)._1 >= 3 && rows(10L)._2) // verbatim leak flagged
    assert(rows(11L)._1 === 1L && !rows(11L)._2) // one shared shingle: clean
    assert(!rows.contains(12L)) // zero overlap -> not even a candidate
  }

  test("bloom decontamination equals the exact unfiltered plan at sf0.001") {
    // the bloom is only a candidate pruner: any divergence from the plain
    // exact join means a false NEGATIVE, which must never happen
    import graft.functions.TextHash._
    val ex = Tables.documents(spark, sfDir)
      .withColumn("toks", expr(tokensSpark("text")))
      .withColumn("hs", expr(shinglesSpark("toks")))
      .where(size(col("hs")) > 0)
      .select(col("doc_id"), explode(col("hs")).as("hsh"))
    val isBench = col("doc_id").between(10, 59)
    val bench = ex.where(isBench).select(col("doc_id").as("bench_id"), col("hsh"))
    val exact = ex.where(!isBench).join(bench, Seq("hsh"))
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(desc("n_shared"), asc("bench_id"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("bench_id"), col("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomed = SparkEntry.queries("q_decontaminate_bloom")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloomed === exact)
    assert(bloomed.nonEmpty) // the slice overlaps at this sf — a real check
  }

  test("boilerplate ratio: dup docs fully common, unique doc zero") {
    // fixture corpus N=4 -> frac cap ceil(0.01*4)=1: a shingle is
    // boilerplate iff it appears in >= 2 docs. Docs 0/1 are identical
    // (every shingle shared), doc 3 shares nothing, doc 2 sits between.
    val rows = run("q_boilerplate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(0L)._3 === 1.0)
    assert(rows(1L)._3 === 1.0)
    assert(rows(3L)._3 === 0.0)
    assert(rows(2L)._3 > 0.0 && rows(2L)._3 < 1.0)
    rows.values.foreach { case (n, c, ratio) =>
      assert(c >= 0 && c <= n)
      assert(math.abs(ratio - c.toDouble / n) < 1e-6 + 1e-9)
    }
  }

  test("connected components converge on a path graph (diameter > 1)") {
    // chain 10-20-30-40 plus isolated edge 50-60: label 10 must propagate
    // three hops — exercises the fixpoint loop beyond dense quasi-cliques
    import spark.implicits._
    val edges = Seq((20L, 10L), (20L, 30L), (40L, 30L), (50L, 60L))
      .toDF("a", "b")
    val cc = operators.GraphOps.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      50L -> 50L, 60L -> 50L))
  }

  test("pointer jumping: a 64-hop chain converges inside the round budget") {
    // diameter 63 >> maxIter 25: plain propagation would silently return
    // unconverged labels; the lab <- lab(lab) doubling step makes this
    // O(log diameter). Descending ids so the min label sits at the FAR
    // end of the chain (worst case for propagation distance).
    import spark.implicits._
    val n = 64
    val edges = (1 until n).map(i => (100L + n - i, 100L + n - i - 1))
      .toDF("a", "b") // chain 163-162-...-100, min id 100 at one end
    val cc = operators.GraphOps.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === n)
    assert(cc.values.toSet === Set(100L), s"unconverged: ${cc.values.toSet}")
  }

  test("minhash LSH pairs agree with exact ngram pairs on this corpus") {
    val lsh = run("q_dedup_minhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("q_dedup_ngram").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }

  test("simhash: identical texts hash equal; near-dups are hamming-close") {
    val sh = run("q_dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sh(0L) === sh(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)))
  }

  test("embedding near-dup pairs: close pair found, orthogonal pairs not") {
    val pairs = run("q_dedup_embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("hot-shingle cap: boilerplate-only pairs drop, content pairs survive") {
    import graft.functions.TextHash._
    import graft.operators.Dedup
    import spark.implicits._
    // 4 docs sharing one boilerplate sentence; 0/1 also share real content.
    val boiler = "all rights reserved by the example corporation of the world"
    val docs = Seq(
      (0L, s"alpha beta gamma delta epsilon zeta eta theta iota kappa $boiler"),
      (1L, s"alpha beta gamma delta epsilon zeta eta theta iota kappa $boiler"),
      (2L, s"one two three four five six seven eight nine ten $boiler"),
      (3L, s"red orange yellow green blue indigo violet pink black white $boiler"))
      .toDF("doc_id", "text")
    val base = docs
      .withColumn("th", expr(hashArraySpark(tokensSpark("text"))))
      .withColumn("hs", expr(shingleHashesSpark("th")))
      .where(size(col("hs")) > 0)
      .select("doc_id", "hs")
    // uncapped (maxDf above corpus size): boilerplate shingles connect
    // everything — 2/3 share ONLY boilerplate with 0/1 yet still pair up
    // with each other at J >= 0.5? No: only the true dup pair clears 0.5,
    // but the boilerplate postings still hit the join. With the cap at
    // df > 3 the boilerplate shingles (df=4) vanish and the content pair
    // keeps jaccard 1.0 on the filtered space.
    val uncapped = Dedup.ngramJaccardPairsCapped(base, maxDf = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardPairsCapped(base, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(uncapped.contains((0L, 1L)))
    assert(capped.map(p => (p._1, p._2)).toSet === Set((0L, 1L)))
    // filtered-space jaccard of the exact dup is exactly 1.0
    assert(capped.find(p => p._1 == 0L && p._2 == 1L).get._3 === 1.0)
    // a pair sharing ONLY boilerplate never becomes a candidate post-cap
    assert(!capped.exists(p => p._1 == 2L && p._2 == 3L))
  }

  test("capped query matches uncapped on the synthetic sf corpus when no shingle is hot") {
    val capped = SparkEntry.queries("q_dedup_ngram_capped")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = SparkEntry.queries("q_dedup_ngram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 4-doc corpus has no shingle with df > 20 -> identical pairs
    assert(capped === plain)
  }

  test("fractional df cap reproduces the absolute cap where ceil(frac·N) = maxDf") {
    // sf0.01 has ~500 shingled docs -> ceil(0.01·N) = 5 = NgramMaxDf, so
    // the two variants must agree to the bit (identical postings in,
    // identical arithmetic out) — the VERDICT-r4 closure of the "absolute
    // cap is the non-scale form" caveat.
    val sf01 = "/root/testdata/sf0.01"
    val abs = SparkEntry.queries("q_dedup_ngram_capped")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val frac = SparkEntry.queries("q_dedup_ngram_fcapped")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(abs.nonEmpty && abs === frac)
  }

  test("fractional cap scales down with the corpus: tiny N caps at df 1") {
    // 4 docs -> ceil(0.01·4) = 1: every shingle present in 2+ docs is
    // "boilerplate" at this corpus size, so no candidate pair survives —
    // the cap is corpus-relative where the absolute form is inert.
    assert(SparkEntry.queries("q_dedup_ngram_fcapped")(spark, dir)
      .collect().isEmpty)
  }

  test("incremental dedup: new batch survives only where the corpus has no match") {
    // corpus split by parity: seen = {0, 2}, new batch = {1, 3}.
    // 1 is an exact copy of seen doc 0 -> dropped; 3 is unrelated -> kept.
    val got = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(3L))
  }

  test("sf0.001 ngram blocking loses nothing vs unblocked ground truth") {
    // recompute truth without the length-band blocking
    import graft.functions.TextHash._
    val base = Tables.documents(spark, sfDir)
      .withColumn("toks", expr(tokensSpark("text")))
      .withColumn("sh", expr(shinglesSpark("toks")))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
    val a = base.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = base.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val i = size(array_intersect(col("a_sh"), col("b_sh")))
    val u = size(col("a_sh")) + size(col("b_sh")) - i
    val truth = a.crossJoin(b).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), (i.cast("double") / u).as("j"))
      .where(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = SparkEntry.queries("q_dedup_ngram")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === truth)
  }

  test("pairCounts equals the inverted-index self-join on random postings") {
    // the one-shuffle grouped-pair formulation (used by the span query)
    // must be row-identical to the two-sided self-join it replaced —
    // fuzz over a random postings table incl. a hot key (df 12) and
    // many unique keys
    import spark.implicits._
    val rnd = new scala.util.Random(87)
    val rows = ((1 to 400).map { i =>
      (rnd.nextInt(40).toLong + 1L, (i * 31 + rnd.nextInt(500)).toLong)
    } ++ (1 to 12).flatMap(d =>
      Seq((d.toLong, 99999L), (d.toLong, 88888L)))).distinct
    val ex = rows.toDF("doc_id", "hsh")
    val got = operators.Dedup.pairCounts(ex)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = ex.select(col("doc_id").as("a_id"), col("hsh"))
      .join(ex.select(col("doc_id").as("b_id"), col("hsh")), Seq("hsh"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n"))
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.exists(_._3 > 1L), "fixture produced no multi-key pair")
  }

  test("minhash calibration: identical sets estimate 1.0, error is bounded") {
    val rows = SparkEntry.queries("q_minhash_calibration")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nEq, est, jac, err) =>
      assert(nEq >= 0 && nEq <= 16, s"($a,$b)")
      assert(est === nEq / 16.0, s"($a,$b)")
      assert(math.abs(err - math.abs(est - jac)) < 1e-12, s"($a,$b)")
      // identical shingle sets hash identically under every permutation
      if (jac == 1.0) assert(nEq === 16L, s"($a,$b) exact dup must estimate 1")
    }
    // hand corpus: an exact-dup pair MUST calibrate to est = jac = 1.0
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, length}
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mhcal").toString
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, txt, "en", "s"), (2L, txt, "en", "s"),
      (3L, "totally different words here with no shared window", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val dup = SparkEntry.queries("q_minhash_calibration")(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(4))))
      .toMap
    assert(dup((1L, 2L)) === ((16L, 1.0)))
  }

  test("fuzzy pairs: blocked on the head noun, exact edit distance, bounded") {
    val rows = SparkEntry.queries("q_fuzzy_pairs")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { case (a, b, blk, l) =>
      assert(a < b)
      assert(a.endsWith(blk) && b.endsWith(blk), s"($a,$b) blocked on $blk")
      assert(l <= 4 && l === lev(a, b).toLong, s"($a,$b)")
    }
    // a known close pair in the synthetic vocabulary
    assert(rows.exists { case (a, b, _, _) =>
      a == "blue widget" && b == "red widget"
    })
  }

  test("keep-best survivor: longest member wins, ties to min id, one per cluster") {
    val rows = SparkEntry.queries("q_dedup_survivor")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    // same membership universe as the min-id cluster query
    val clusters = SparkEntry.queries("q_dedup_cluster")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === clusters)
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val survivors = members.filter(_._5)
      assert(survivors.length === 1, s"cluster $cid")
      val best = members.minBy { case (id, _, nc, _, _) => (-nc, id) }
      assert(survivors.head._1 === best._1, s"cluster $cid")
      assert(members.forall(_._4 === best._1), s"cluster $cid")
    }
  }
}
