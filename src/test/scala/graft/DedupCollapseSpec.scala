package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-hardening net for the document dedup family's exact-duplicate
  * collapse (the ×100 replica rung's disk-filling lesson: every pairwise
  * stage — uncapped/capped n-gram Jaccard, 10-gram spans, MinHash verify,
  * embedding cosine — had an intermediate that grows with the SQUARE of
  * duplicate multiplicity). Pins, on a ×5 clone fixture built with
  * ScaleUp's disjoint key-offset rule:
  *
  *  1. the MECHANISM — the delegate population (and with it the quadratic
  *     stage's input) does not move under clone replication;
  *  2. EXACTNESS — the collapsed formulations return the identical pair
  *     sets a from-scratch naive implementation computes on the cloned
  *     corpus (the naive forms are re-derived inline from the TextHash
  *     expression fragments, not imported from the module under test).
  */
class DedupCollapseSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  import graft.operators.Dedup

  @volatile private var cloneDirsCreated: List[String] = Nil

  override def afterAll(): Unit = {
    cloneDirsCreated.foreach { d =>
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val root = Path.of(d)
      if (Files.exists(root))
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
    }
    super.afterAll()
  }

  /** sf0.001 documents + embeddings replicated ×5 under disjoint id
    * ranges — the clone-family shape of the scale replicas.
    */
  private lazy val cloneDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupcol").toString
    cloneDirsCreated = dir :: cloneDirsCreated
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until 5).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * ScaleUp.KeyOffset)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until 5).map(i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i * ScaleUp.KeyOffset)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Naive (pre-collapse) n-gram Jaccard pairs, re-derived from the public
    * TextHash fragments — the reference implementation the collapse must
    * reproduce bit-for-bit.
    */
  private def naiveNgramPairs(d: String): DataFrame = {
    import graft.functions.TextHash._
    val base = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), expr(tokensSpark("text")).as("toks"))
      .withColumn("th", expr(hashArraySpark("toks")))
      .withColumn("hs", expr(shingleHashesSpark("th")))
      .where(size(col("hs")) > 0)
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("n"))
      .persist()
    val ex = base.select(col("doc_id"), explode(col("hs")).as("hsh"))
    val counts = ex.select(col("doc_id").as("a_id"), col("hsh"))
      .join(ex.select(col("doc_id").as("b_id"), col("hsh")), Seq("hsh"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    val sizes = base.select(col("doc_id"), col("n"))
    counts
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .as("jaccard"))
      .where(col("jaccard") >= 0.5)
  }

  test("delegate population is invariant under ×5 clone replication") {
    val baseDelegates = Dedup.dupGroups(spark, sfDir)
      .where(col("doc_id") === col("gid")).count()
    val cloneDelegates = Dedup.dupGroups(spark, cloneDir)
      .where(col("doc_id") === col("gid")).count()
    val baseMembers = Dedup.dupGroups(spark, sfDir).count()
    val cloneMembers = Dedup.dupGroups(spark, cloneDir).count()
    assert(baseDelegates > 0L)
    assert(cloneDelegates === baseDelegates,
      s"delegate count moved under clones: $baseDelegates -> $cloneDelegates" +
        " — the quadratic stage is seeing duplicate multiplicity")
    assert(cloneMembers === baseMembers * 5,
      "membership must cover every replica exactly once")
  }

  test("collapsed ngram pairs == naive inverted-index pairs on the clone corpus") {
    val naive = naiveNgramPairs(cloneDir)
    val collapsed = Dedup.ngramPairs(spark, cloneDir)
    val naiveCount = naive.count()
    assert(naiveCount > 0L, "clone fixture produced no naive pairs")
    assert(collapsed.count() === naiveCount)
    // full-row set equality including the float: jaccard values are the
    // same two-integer divisions in both forms, so exceptAll is exact
    assert(collapsed.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(collapsed).count() === 0L)
    // and the clone algebra is visible: a pair of replicas of the SAME
    // base doc (ids congruent mod the replica offset) is an exact dup
    // and must score jaccard exactly 1.0
    val badClonePairs = collapsed
      .where((col("b_id") - col("a_id")) % ScaleUp.KeyOffset === 0 &&
        col("jaccard") =!= 1.0)
    assert(badClonePairs.count() === 0L,
      "a clone pair (same base id, different replica) scored jaccard != 1.0")
  }

  test("collapsed embedding pairs == naive blocked self-join on the clone corpus") {
    val e = spark.read.parquet(s"$cloneDir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm",
        sqrt(graft.functions.ArrayOps.dotDouble(col("v"), col("v"))))
      .persist()
    val a = e.select(col("vec_id").as("a_id"), col("label"),
      col("v").as("av"), col("nrm").as("an"))
    val b = e.select(col("vec_id").as("b_id"), col("label"),
      col("v").as("bv"), col("nrm").as("bn"))
    val naive = a.join(b, Seq("label"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        try_divide(graft.functions.ArrayOps.dotDouble(col("av"), col("bv")),
          col("an") * col("bn")).as("cosine"))
      .where(col("cosine") >= 0.4)
    val collapsed = SparkEntry.queries("q_dedup_embedding")(spark, cloneDir)
    val naiveCount = naive.count()
    assert(naiveCount > 0L, "clone fixture produced no naive cosine pairs")
    assert(collapsed.count() === naiveCount)
    assert(collapsed.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(collapsed).count() === 0L)
  }

  /** Shingle-bearing base frame on a corpus dir — the shared head of the
    * capped/MinHash naive twins (re-derived from TextHash fragments).
    */
  private def naiveShingled(d: String): DataFrame = {
    import graft.functions.TextHash._
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), expr(tokensSpark("text")).as("toks"))
      .withColumn("th", expr(hashArraySpark("toks")))
      .withColumn("hs", expr(shingleHashesSpark("th")))
      .where(size(col("hs")) > 0)
      .select(col("doc_id"), col("hs"))
  }

  /** Naive df-capped Jaccard pairs: hot set over the FULL cloned corpus
    * (per-doc df, not per-delegate — the Σm-weighted-df equivalence is
    * exactly what this twin checks), postings filtered, sizes recomputed
    * on the surviving shingle space, full self-join.
    */
  private def naiveCappedPairs(d: String, maxDf: Long): DataFrame = {
    val base = naiveShingled(d)
    val ex0 = base.select(col("doc_id"), explode(col("hs")).as("hsh"))
    val hot = ex0.groupBy("hsh").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("hsh")
    val ex = ex0.join(hot, Seq("hsh"), "left_anti").persist()
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val counts = ex.select(col("doc_id").as("a_id"), col("hsh"))
      .join(ex.select(col("doc_id").as("b_id"), col("hsh")), Seq("hsh"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    counts
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .as("jaccard"))
      .where(col("jaccard") >= 0.5)
  }

  /** Naive banded-MinHash frame (doc_id, hs, mharr, band keys) over every
    * document — no delegate collapse anywhere.
    */
  private def naiveMinhashSig(d: String): DataFrame = {
    import graft.functions.TextHash.{A, B, P}
    val mh = (0 until 16).map(j =>
      expr(s"array_min(transform(hs, x -> (${A(j)}*x + ${B(j)}) % $P))")
        .as(f"mh$j%02d"))
    naiveShingled(d)
      .select(col("doc_id") +: col("hs") +: mh: _*)
      .withColumn("mharr", array((0 until 16).map(j => col(f"mh$j%02d")): _*))
      .withColumn("bands", array((0 until 4).map { g =>
        struct(lit(g).as("g"), concat_ws(",",
          (4 * g until 4 * g + 4).map(j => col(f"mh$j%02d")): _*).as("k"))
      }: _*))
  }

  /** Naive LSH candidates + exact-Jaccard verify with the full per-doc
    * signature/shingle payload — (a_id, b_id, n_eq, est_jaccard, jaccard),
    * unfiltered; callers project/filter per query shape.
    */
  private def naiveMinhashVerified(d: String): DataFrame = {
    val sig = naiveMinhashSig(d).persist()
    val ex = sig.select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.g").as("g"), col("b.k").as("k"))
    val cand = ex.select(col("doc_id").as("a_id"), col("g"), col("k"))
      .join(ex.select(col("doc_id").as("b_id"), col("g"), col("k")), Seq("g", "k"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val side = sig.select(col("doc_id"), col("hs"), col("mharr"))
    val i = size(array_intersect(col("a_hs"), col("b_hs")))
    val u = size(col("a_hs")) + size(col("b_hs")) - i
    cand
      .join(side.select(col("doc_id").as("a_id"), col("hs").as("a_hs"),
        col("mharr").as("a_mh")), Seq("a_id"))
      .join(side.select(col("doc_id").as("b_id"), col("hs").as("b_hs"),
        col("mharr").as("b_mh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("aggregate(zip_with(a_mh, b_mh, (x, y) -> " +
          "CASE WHEN x = y THEN 1L ELSE 0L END), 0L, (a, x) -> a + x)")
          .as("n_eq"),
        i.cast("double").as("di"), u.cast("double").as("du"), u.as("u"))
      .where(col("u") > 0)
      .select(col("a_id"), col("b_id"), col("n_eq"),
        (col("n_eq") / lit(16.0)).as("est_jaccard"),
        (col("di") / col("du")).as("jaccard"))
  }

  private def assertSameRows(collapsed: DataFrame, naive: DataFrame,
      what: String): Unit = {
    val naiveCount = naive.count()
    assert(naiveCount > 0L, s"clone fixture produced no naive $what")
    assert(collapsed.count() === naiveCount, s"$what row count")
    assert(collapsed.exceptAll(naive).count() === 0L, s"$what: extra rows")
    assert(naive.exceptAll(collapsed).count() === 0L, s"$what: missing rows")
  }

  test("collapsed ABS-capped pairs == naive full-corpus-df pairs on clones") {
    // the ×5 clones push every shingle's df to ≥5, so the abs cap (df>5)
    // turns hot EVERY shingle shared by ≥2 base docs — the weighted-df
    // (Σm over delegate groups) path and the fully-boilerplate-doc
    // eligibility edge are both exercised far harder than at base scale
    assertSameRows(
      SparkEntry.queries("q_dedup_ngram_capped")(spark, cloneDir),
      naiveCappedPairs(cloneDir, operators.Dedup.NgramMaxDf.toLong),
      "abs-capped pairs")
  }

  test("collapsed FRAC-capped pairs == naive pairs with cap over clone N") {
    // the fractional cap is computed over the CLONED corpus size (N×5 →
    // cap 25 here), so clone-inflated dfs mostly stay under it — the rung
    // where the naive form inherits the full m² blowup at scale
    val n = naiveShingled(cloneDir).count()
    val cap = math.ceil(operators.Dedup.NgramMaxDfFrac * n).toLong
    assert(cap > operators.Dedup.NgramMaxDf.toLong,
      "fixture must exercise a cap looser than the absolute one")
    assertSameRows(
      SparkEntry.queries("q_dedup_ngram_fcapped")(spark, cloneDir),
      naiveCappedPairs(cloneDir, cap),
      "frac-capped pairs")
  }

  test("collapsed MinHash LSH pairs == naive banded pairs on the clone corpus") {
    assertSameRows(
      SparkEntry.queries("q_dedup_minhash_pairs")(spark, cloneDir),
      naiveMinhashVerified(cloneDir)
        .where(col("jaccard") >= 0.5)
        .select("a_id", "b_id", "jaccard"),
      "minhash pairs")
  }

  test("collapsed calibration pairs == naive estimate+exact frame on clones") {
    assertSameRows(
      operators.Dedup.calibrationPairs(spark, cloneDir),
      naiveMinhashVerified(cloneDir),
      "calibration pairs")
  }

  /** Naive distinct (doc_id, h) chunk-hash postings — re-derived from the
    * 64-unit chunking rule + the public TextHash fragment, not imported
    * from the module under test.
    */
  private def naiveChunkPostings(d: String): DataFrame = {
    import graft.functions.TextHash
    spark.read.parquet(s"$d/documents.parquet")
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(expr(
          "sequence(1, cast(ceil(char_length(text) / 64.0) AS bigint))"))
          .as("i"))
      .withColumn("chunk",
        expr("substring(text, cast((i - 1) * 64 + 1 AS int), 64)"))
      .select(col("doc_id"), expr(TextHash.polySpark("chunk")).as("h"))
      .distinct()
  }

  /** Naive (uncollapsed, optionally df-capped) chunk-overlap pairs: the
    * q_mm_dedup reference semantics, full postings self-join over every
    * document. capPct: None = uncapped; Some(p) drops hashes with
    * df * p > n_docs (the integer-exact fractional cap).
    */
  private def naiveMmPairs(d: String, capPct: Option[Long]): DataFrame = {
    val ch0 = naiveChunkPostings(d).persist()
    val ch = capPct match {
      case None => ch0
      case Some(p) =>
        val nDocs = ch0.select("doc_id").distinct().count()
        val hot = ch0.groupBy("h").agg(count(lit(1)).as("df"))
          .where(col("df") * lit(p) > lit(nDocs)).select("h")
        ch0.join(hot, Seq("h"), "left_anti")
    }
    ch.select(col("doc_id").as("a_id"), col("h"))
      .join(ch.select(col("doc_id").as("b_id"), col("h")), Seq("h"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 3)
  }

  test("mm delegate population is invariant under ×5 clone replication") {
    import graft.operators.Multimodal
    val baseDel = Multimodal.mmDupGroups(spark, sfDir)
      .where(col("doc_id") === col("gid")).count()
    val cloneDel = Multimodal.mmDupGroups(spark, cloneDir)
      .where(col("doc_id") === col("gid")).count()
    val baseMem = Multimodal.mmDupGroups(spark, sfDir).count()
    val cloneMem = Multimodal.mmDupGroups(spark, cloneDir).count()
    assert(baseDel > 0L)
    assert(cloneDel === baseDel,
      s"mm delegate count moved under clones: $baseDel -> $cloneDel — the " +
        "chunk-pair stage is seeing duplicate multiplicity")
    assert(cloneMem === baseMem * 5,
      "mm membership must cover every replica exactly once")
  }

  test("collapsed mm chunk pairs == naive postings self-join on the clone corpus") {
    assertSameRows(
      SparkEntry.queries("q_mm_dedup")(spark, cloneDir),
      naiveMmPairs(cloneDir, None),
      "mm chunk pairs")
  }

  /** Clone corpus with a 192-char (3-chunk-aligned, single distinct hash)
    * boilerplate prefix on EVERY document — the shared-container-header
    * shape the df-cap exists for. The prefix is hot by construction
    * (df = 100 % of chunk-bearing docs >> 1 %), so the capped query must
    * drop it; the uncapped query counts it into every overlap.
    */
  private lazy val boilerDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mmboiler").toString
    cloneDirsCreated = dir :: cloneDirsCreated
    spark.read.parquet(s"$cloneDir/documents.parquet")
      .withColumn("text", concat(lit("X" * 192), col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("capped mm pairs == naive full-corpus-df pairs on the boilerplate corpus") {
    val capped = SparkEntry.queries("q_mm_dedup_capped")(spark, boilerDir)
    assertSameRows(capped, naiveMmPairs(boilerDir, Some(100L)),
      "capped mm pairs")
    // and the cap must actually BITE here: the boilerplate hash inflates
    // every uncapped overlap by one, so pairs sharing exactly 2 organic
    // chunks cross the >=3 bar only in the uncapped form
    val uncapped = SparkEntry.queries("q_mm_dedup")(spark, boilerDir).count()
    assert(capped.count() < uncapped,
      "boilerplate fixture produced no cap effect — hot set was empty")
  }

  test("collapsed span pairs == naive rolling-hash pairs on the clone corpus") {
    import graft.functions.TextHash._
    val P = 1000000007L
    val roll = (1 until 10).foldLeft("element_at(t, i + 0)")((acc, j) =>
      s"($acc * 8191 + element_at(t, i + $j)) % $P")
    val spanExpr =
      s"CASE WHEN size(th) < 10 THEN array() ELSE " +
        s"element_at(transform(array(th), t -> array_distinct(transform(" +
        s"sequence(1, size(t) - 9), i -> $roll))), 1) END"
    val ex = spark.read.parquet(s"$cloneDir/documents.parquet")
      .select(col("doc_id"), expr(tokensSpark("text")).as("toks"))
      .withColumn("th", expr(hashArraySpark("toks")))
      .select(col("doc_id"), expr(spanExpr).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("hsh"))
    val naive = ex.select(col("doc_id").as("a_id"), col("hsh"))
      .join(ex.select(col("doc_id").as("b_id"), col("hsh")), Seq("hsh"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_spans"))
    val collapsed = SparkEntry.queries("q_dedup_span")(spark, cloneDir)
    val naiveCount = naive.count()
    assert(naiveCount > 0L, "clone fixture produced no naive span pairs")
    assert(collapsed.count() === naiveCount)
    assert(collapsed.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(collapsed).count() === 0L)
  }
}
