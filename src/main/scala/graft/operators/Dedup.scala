package graft.operators

import graft.{Q, Tables}
import graft.functions.TextHash._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline tier: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup —
  * over the `documents` / `embeddings` tables.
  *
  * Scale design (100 TB):
  *  - candidate generation is always *blocked* (length band / LSH band /
  *    label bucket) and joined on equi-keys, so Spark plans a shuffled hash
  *    join on the block key — never a cartesian or theta join. Banded keys
  *    are exploded into rows, which is the standard LSH-on-Spark layout
  *    (one shuffle, skew-resistant because band keys are hash-distributed).
  *  - the oracle runs the exact same math in DuckDB SQL (fragments from
  *    graft.functions.TextHash), including LSH banding — results are
  *    deterministic, so hash-parity is exact.
  *  - at cluster scale the parity polyHash would be swapped for xxhash64
  *    and the exact-dedup groupBy key for sha2(text) — noted per site.
  */
object Dedup {

  /** documents + ordered token hashes (th) + distinct shingle hashes (hs).
    *
    * Shape notes (each measured at sf0.1):
    *  - repartition BEFORE tokenizing: documents arrive as one parquet file
    *    = one partition, which would run the char-level hashing on a single
    *    core;
    *  - persist AFTER: every dedup query references this frame 2–3 times
    *    (signature + verify sides of a self-join), and without a
    *    materialization boundary CollapseProject re-inlines the tokenize+
    *    hash work into every reference — measured O(n^2) regex work per
    *    document. At 100 TB this frame is the thing you'd write once as a
    *    silver table; in-session, MEMORY_AND_DISK caching is its analog.
    */
  private[operators] def shingled(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.Caches.getOrElseUpdate(
      s"shingled:$d:${graft.Caches.fingerprint(s, d)}",
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          expr(tokensSpark("text")).as("toks"))
        .withColumn("th", expr(hashArraySpark("toks")))
        .select("doc_id", "lang", "n_chars", "th")
        .withColumn("hs", expr(shingleHashesSpark("th")))
        .persist())

  private val shingledDuck =
    s"""t AS (SELECT doc_id, lang, n_chars, ${tokensDuck("text")} AS toks FROM documents),
       |h0 AS (SELECT doc_id, lang, n_chars, ${hashArrayDuck("toks")} AS th FROM t),
       |h AS (SELECT doc_id, lang, n_chars, th, ${shingleHashesDuck("th")} AS hs FROM h0)""".stripMargin

  /** Hot-shingle document-frequency cap for q_dedup_ngram_capped: shingles
    * present in more than this many documents are treated as boilerplate
    * and dropped before the inverted-index self-join. Sized so the cap is
    * actually exercised at sf0.01 (measured df histogram tops out at 7
    * there — 29 template shingles exceed 5) while content shingles
    * survive. See [[NgramMaxDfFrac]] for the corpus-relative form.
    */
  val NgramMaxDf: Int = 5

  /** Fractional form of the boilerplate cap: maxDf = ceil(frac · N), N =
    * shingled-document count — the 100 TB form (an absolute cap tuned at
    * one corpus size silently stops capping when the corpus grows 100×; a
    * fraction tracks it). 0.01 reproduces the absolute cap 5 at sf0.01
    * (N≈500 → ceil(5) = 5), which DedupSpec pins by comparing both
    * variants' full output there.
    */
  val NgramMaxDfFrac: Double = 0.01

  /** Postings surviving the boilerplate cap: anti-join the exploded
    * (doc, shingle-hash) postings against the hot-shingle set (df > maxDf
    * documents). The hot set is tiny by construction (≤ postings/maxDf
    * ids) → one broadcast, no extra shuffle of the postings.
    */
  def cappedPostings(base: DataFrame, maxDf: Long): DataFrame = {
    val ex0 = base.select(col("doc_id"), explode(col("hs")).as("hsh"))
    val hot = ex0.groupBy("hsh").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("hsh")
    ex0.join(broadcast(hot), Seq("hsh"), "left_anti")
  }

  /** The fraction-capped postings, memoized + pre-partitioned on hsh —
    * shared by q_dedup_ngram_fcapped (its self-join rides the cached
    * partitioning) and q_boilerplate (per-doc kept-postings counts: a doc's
    * boilerplate shingles are exactly the ones the cap dropped).
    */
  private def fcappedPostings(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.Caches.getOrElseUpdate(
      s"fcapped-postings:$d:${graft.Caches.fingerprint(s, d)}:$NgramMaxDfFrac",
      cappedPostingsByFrac(
        shingled(s, d).where(size(col("hs")) > 0)
          .select(col("doc_id"), col("hs")),
        maxDfFrac = NgramMaxDfFrac).repartition(col("hsh")).persist())

  /** Inverted-index Jaccard pairs over a postings frame (doc_id, hsh):
    * per-doc sizes recomputed from the (possibly capped) postings so the
    * Jaccard stays well-defined on the filtered shingle space. The postings
    * frame is referenced FOUR times (both join sides + both size lookups) —
    * callers on real data should pass a persisted frame (see the
    * q_dedup_ngram_capped entry; the uncached plan recomputes the explode +
    * anti-join 4×, measured 2.1 s vs 1.3 s at sf0.1).
    */
  def ngramJaccardPairsFromPostings(ex: DataFrame,
      threshold: Double = 0.5): DataFrame =
    ngramJaccardPairsUnordered(ex, threshold).orderBy("a_id", "b_id")

  /** [[ngramJaccardPairsFromPostings]] without the final presentation
    * sort — the form the capped queries memoize (the pair frame is the
    * built dedup index; only the ORDER BY is per-serve work).
    */
  private[operators] def ngramJaccardPairsUnordered(ex: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // candidate generation stays the codegen'd inverted-index SELF-JOIN
    // here: capped 3-gram postings keep keys up to the df cap (50 at
    // sf0.1 for the fractional form), and at C(50,2) pairs per key the
    // join's codegen pair emission beats [[pairCounts]]'s per-element
    // lambda slices (measured 1.6 s vs 1.3 s at sf0.1); pairCounts wins
    // where keys are near-unique (the 10-gram span postings)
    // SHUFFLE_HASH, not broadcast: callers persist the postings
    // pre-partitioned on hsh, so the self-join zips cached partitions
    // with NO exchange and no per-run driver-serial broadcast build
    // (postings are corpus-sized — they would not broadcast at 100 TB)
    val counts = ex.select(col("doc_id").as("a_id"), col("hsh")).hint("SHUFFLE_HASH")
      .join(ex.select(col("doc_id").as("b_id"), col("hsh")).hint("SHUFFLE_HASH"), Seq("hsh"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("i"))
    counts
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Shared-key pair counts `(a_id, b_id, n_shared)` from exploded
    * `(doc_id, hsh)` postings — the candidate-generation core of every
    * inverted-index dedup query. ONE aggregation shape instead of the
    * self-join: group the postings by key, keep only keys shared by >1
    * document (the overwhelming majority of keys are unique and die in
    * the partial aggregate, map-side), emit the ordered in-group pairs
    * from the sorted id array, and count pairs. Replaces two full
    * shuffles of the postings (both self-join sides) + a pair shuffle
    * with ONE full shuffle + a pair shuffle over only true candidates
    * (measured 1.7 s → sub-second on the span query at sf0.1). The
    * quadratic bound is unchanged: a key shared by k docs yields C(k,2)
    * pairs in both formulations, colocated on the key either way.
    * Best for postings whose keys are NEAR-UNIQUE (long spans): pair
    * emission goes through per-element lambda slices, so at high shared
    * df the codegen'd self-join generates pairs faster — the Jaccard
    * family keeps the join for exactly that reason.
    */
  def pairCounts(ex: DataFrame): DataFrame =
    ex.groupBy("hsh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")) > 1)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds)), y -> " +
          "struct(x AS a_id, y AS b_id))))")).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))

  /** N-gram Jaccard pairs with the boilerplate cap. Recall trade-off: a
    * pair whose shared shingles are ALL hot is never a candidate — at the
    * boilerplate df the cap targets, that is the desired behaviour.
    */
  def ngramJaccardPairsCapped(base: DataFrame, maxDf: Long,
      threshold: Double = 0.5): DataFrame =
    ngramJaccardPairsFromPostings(cappedPostings(base, maxDf), threshold)

  /** [[cappedPostings]] with the cap as a document-frequency FRACTION of
    * the corpus: N comes from one tiny aggregate over `base` (one row per
    * document by construction) whose single row is broadcast into the
    * hot-shingle threshold — same single-shuffle shape as the absolute
    * form, no extra pass over the postings.
    */
  def cappedPostingsByFrac(base: DataFrame, maxDfFrac: Double): DataFrame = {
    val ex0 = base.select(col("doc_id"), explode(col("hs")).as("hsh"))
    val n = base.agg(count(lit(1)).as("n_docs"))
    val hot = ex0.groupBy("hsh").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .where(col("df") > ceil(lit(maxDfFrac) * col("n_docs")).cast("long"))
      .select("hsh")
    ex0.join(broadcast(hot), Seq("hsh"), "left_anti")
  }

  /** Exploded LSH band keys (doc_id, g, k) from a shingled frame: 16
    * MinHash values folded into 4 bands of 4, one output row per (doc,
    * band) — the bucketed layout every banded join in this module keys on.
    */
  def bandedKeys(base: DataFrame): DataFrame =
    bandsFromSig(base.select(
      col("doc_id") +:
        minhashExprs.map { case (j, spark, _) => expr(spark).as(f"mh$j%02d") }: _*))

  /** Band explosion over a frame that ALREADY carries mh00..mh15 — lets
    * consumers of the memoized signature frame band without re-running
    * the 16 array folds. `carry` columns ride along unchanged (the
    * streaming twin needs the arrival timestamp next to each band key).
    */
  private def bandsFromSig(sig: DataFrame,
      carry: Seq[String] = Seq.empty): DataFrame = {
    val kept = (col("doc_id") +: carry.map(col)) :+ explode(array(
      (0 until 4).map { g =>
        struct(lit(g).as("g"),
          concat_ws(",",
            (4 * g until 4 * g + 4).map(j => col(f"mh$j%02d")): _*).as("k"))
      }: _*)).as("band")
    sig.select(kept: _*)
      .select((col("doc_id") +: carry.map(col)) :+
        col("band.g").as("g") :+ col("band.k").as("k"): _*)
  }

  /** Band keys for an ARBITRARY (doc_id, text, …) frame — the full
    * tokenize → hash → shingle → MinHash → band chain of the memoized
    * batch path, expressed stateless and map-side so a STREAMING frame
    * can run it per micro-batch (streaming/Streams.lshDedupStream).
    * Docs with no shingles (< 3 tokens) emit no bands — same contract as
    * every banded batch consumer. `carry` columns ride along.
    */
  def bandKeysFor(docs: DataFrame, carry: Seq[String] = Seq.empty): DataFrame = {
    import graft.functions.TextHash._
    val sig = docs
      .withColumn("__toks", expr(tokensSpark("text")))
      .withColumn("__th", expr(hashArraySpark("__toks")))
      .withColumn("hs", expr(shingleHashesSpark("__th")))
      .where(size(col("hs")) > 0)
      .select(col("doc_id") +: carry.map(col) :+ col("hs"): _*)
    bandsFromSig(sig.select(
      (col("doc_id") +: carry.map(col)) ++
        minhashExprs.map { case (j, spark, _) => expr(spark).as(f"mh$j%02d") }: _*),
      carry)
  }

  /** 16 MinHash values as (sparkExpr, duckExpr) pairs over hash-array col hs. */
  private def minhashExprs: Seq[(Int, String, String)] =
    (0 until 16).map { j =>
      (j,
        s"array_min(transform(hs, x -> (${A(j)}*x + ${B(j)}) % $P))",
        s"list_min(list_transform(hs, x -> (${A(j)}*x + ${B(j)}) % $P))")
    }

  /** (doc_id, hs, mh00..mh15) — the 16-permutation signature frame,
    * memoized + persisted per directory: the signature dump, the LSH pair
    * query and the calibration/sweep pair only differ DOWNSTREAM of these
    * 16 array folds over every shingle set, which are the expensive half
    * of each. Empty-shingle docs keep null signatures here; pair-shaped
    * consumers filter them out, the dump keeps them.
    */
  private def minhashSigs(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.Caches.getOrElseUpdate(
      s"minhash-sigs:$d:${graft.Caches.fingerprint(s, d)}",
      shingled(s, d)
        .select(col("doc_id") +: col("hs") +:
          minhashExprs.map { case (j, spark, _) =>
            expr(spark).as(f"mh$j%02d") }: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Exploded LSH band keys over the memoized signature frame, persisted
    * pre-partitioned on (g, k): the LSH pair query self-joins this frame
    * (both sides read the cached partitioning — no per-run exchange) and
    * the incremental-dedup query probes it; each re-ran the four-band
    * explosion + repartition per execution otherwise.
    */
  private def minhashBands(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.Caches.getOrElseUpdate(
      s"minhash-bands:$d:${graft.Caches.fingerprint(s, d)}",
      bandsFromSig(minhashSigs(s, d).where(size(col("hs")) > 0))
        .repartition(col("g"), col("k"))
        .persist())

  /** Delegate-only band keys, pre-partitioned on (g, k) — the candidate
    * source for the PAIR-shaped MinHash queries (see dupGroups: identical
    * token-hash arrays ⇒ identical signatures ⇒ identical band keys, so
    * band-bucket membership is decidable at the delegate level and bucket
    * sizes stay bounded by distinct content, not duplicate multiplicity).
    * The full [[minhashBands]] stays for the LINEAR consumers (the
    * incremental probe's batch side, the signature dump).
    */
  private def minhashBandsDelegates(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.Caches.getOrElseUpdate(
      s"minhash-bands-delegates:$d:${graft.Caches.fingerprint(s, d)}",
      bandsFromSig(minhashSigs(s, d).where(size(col("hs")) > 0)
          .join(delegateIds(s, d), Seq("doc_id"), "left_semi"))
        .repartition(col("g"), col("k"))
        .persist())

  /** Exact-duplicate collapse membership over the shingle-bearing corpus:
    * (doc_id, gid), gid = min doc_id among documents with an IDENTICAL
    * token-hash array. Every pairwise dedup feature in this module
    * (shingle set, capped shingle set, 10-gram span set, MinHash
    * signature, band keys) is a pure function of `th`, so members of a
    * group are interchangeable in ANY of the pair computations — which
    * is what lets every quadratic candidate stage run over one DELEGATE
    * per group and expand afterwards. Under ×m exact-clone replication
    * (a real web corpus's mirror/repost multiplicity; ScaleUp's clone
    * families) the delegate population is CONSTANT while the naive pair
    * stages grow m² — the ×100 replica run killed the uncapped postings
    * join with exactly that blowup (its intermediate grew ×10⁴ and
    * filled the disk) before this collapse existed.
    *
    * One linear shuffle keyed on the array itself (Spark arrays are
    * group-comparable — same idiom as Similarity.semDedupGrouped); the
    * persisted frame is two BIGINTs per doc.
    */
  private[graft] def dupGroups(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.Caches.getOrElseUpdate(
      s"dup-groups:$d:${graft.Caches.fingerprint(s, d)}",
      shingled(s, d).where(size(col("hs")) > 0)
        .select(col("doc_id"), col("th"))
        .withColumn("gid", min("doc_id").over(Window.partitionBy("th")))
        .select("doc_id", "gid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Delegate doc_ids (one per exact-dup group) — the population every
    * quadratic pair stage runs over.
    */
  private def delegateIds(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    dupGroups(s, d).where(col("doc_id") === col("gid")).select("doc_id")

  /** Expand delegate-level pairs (a_id, b_id = gids, payload…) to the
    * full doc-level pair list: each delegate pair fans out to
    * members(A) × members(B), re-oriented so a_id < b_id (groups are
    * disjoint, so least/greatest is total). Payload columns ride along
    * unchanged — cross-group member pairs share their delegates' exact
    * feature sets, so jaccard / n_spans / n_eq are THE same values, not
    * approximations. The two membership joins are output-bound: their
    * intermediates ARE the result rows.
    */
  private[operators] def expandDelegatePairs(dpairs: DataFrame,
      mem: DataFrame): DataFrame = {
    val payload = dpairs.columns.filterNot(c => c == "a_id" || c == "b_id")
    dpairs
      .withColumnRenamed("a_id", "__ga").withColumnRenamed("b_id", "__gb")
      .join(mem.select(col("gid").as("__ga"), col("doc_id").as("__xa")),
        Seq("__ga"))
      .join(mem.select(col("gid").as("__gb"), col("doc_id").as("__xb")),
        Seq("__gb"))
      .select(least(col("__xa"), col("__xb")).as("a_id") +:
        greatest(col("__xa"), col("__xb")).as("b_id") +:
        payload.map(col): _*)
  }

  /** Within-group member pairs (a_id < b_id) for the groups listed in
    * `eligible` (gid [+ payload columns to carry]). Self-join of the
    * membership frame on gid — intermediate = output, the expansion's
    * other output-bound half.
    */
  private[operators] def withinGroupPairs(mem: DataFrame,
      eligible: DataFrame): DataFrame = {
    val payload = eligible.columns.filterNot(_ == "gid")
    mem.select(col("gid"), col("doc_id").as("a_id"))
      .join(mem.select(col("gid"), col("doc_id").as("b_id")), Seq("gid"))
      .where(col("a_id") < col("b_id"))
      .join(eligible, Seq("gid"))
      .select(col("a_id") +: col("b_id") +: payload.map(col): _*)
  }

  /** Collapsed build of the df-capped Jaccard pairs: delegate postings
    * with each shingle's document frequency computed over the FULL corpus
    * (delegates weighted by group size — Σ m over groups containing the
    * shingle ≡ the naive per-doc count, so the hot set is identical),
    * the surviving delegate postings self-joined at base scale, then the
    * output-bound expansion. The capped shingle set is a pure function of
    * `th`, so group members share it and within-group pairs sit at
    * jaccard 1.0 — but ONLY for groups with ≥1 surviving posting (a doc
    * whose every shingle is boilerplate emits no postings, hence no pair
    * with its own exact clone — preserved by the eligibility filter).
    * maxDf: Left(absolute cap) or Right(df fraction of corpus size).
    */
  private def cappedNgramPairsCollapsed(s: org.apache.spark.sql.SparkSession,
      d: String, maxDf: Either[Long, Double]): DataFrame = {
    val mem = dupGroups(s, d)
    val gsizes = mem.groupBy("gid").agg(count(lit(1)).as("m"))
    // cap discriminator lives in the PREFIX (before the first ':'): Bench
    // truncates cache keys at the first ':' for its JSON report, so a
    // shared prefix would emit the same JSON key twice (abs + frac caps)
    val pfx = maxDf.fold(_ => "capped-dpostings-abs", _ => "capped-dpostings-frac")
    val key = maxDf.fold(c => s"abs:$c", f => s"frac:$f")
    val ex = graft.Caches.getOrElseUpdate(
      s"$pfx:$d:${graft.Caches.fingerprint(s, d)}:$key", {
        val ex0 = shingled(s, d).where(size(col("hs")) > 0)
          .join(delegateIds(s, d), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), explode(col("hs")).as("hsh"))
        val dfs = ex0
          .join(gsizes.select(col("gid").as("doc_id"), col("m")), Seq("doc_id"))
          .groupBy("hsh").agg(sum("m").as("df"))
        val hot = maxDf match {
          case Left(cap) => dfs.where(col("df") > cap).select("hsh")
          case Right(frac) =>
            val n = gsizes.agg(sum("m").as("n_docs"))
            dfs.crossJoin(broadcast(n))
              .where(col("df") > ceil(lit(frac) * col("n_docs")).cast("long"))
              .select("hsh")
        }
        ex0.join(broadcast(hot), Seq("hsh"), "left_anti")
          .repartition(col("hsh")).persist()
      })
    val dpairs = ngramJaccardPairsUnordered(ex, threshold = 0.5)
    val eligible = ex.select(col("doc_id").as("gid")).distinct()
      .withColumn("jaccard", lit(1.0))
    expandDelegatePairs(dpairs, mem)
      .unionByName(withinGroupPairs(mem, eligible))
  }

  /** Spark side of the inverted-index n-gram Jaccard pairs (threshold 0.5)
    * — the q_dedup_ngram plan, shared with the cluster-resolution query.
    */
  private[graft] def ngramPairs(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    // memoized + persisted: SIX consumers (the pair dump, the Jaccard
    // histogram, the degree distribution, split assignment, and the CC /
    // PageRank builds) each re-ran the postings self-join otherwise —
    // the pair frame itself is tiny (bounded by true near-dups), so the
    // persist costs nothing and saves the quadratic-half of each query
    graft.Caches.getOrElseUpdate(
      s"ngram-pairs:$d:${graft.Caches.fingerprint(s, d)}",
      ngramPairsUncached(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def ngramPairsUncached(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    // The quadratic half (postings self-join) runs over DELEGATES only —
    // one doc per distinct token-hash array — so its intermediate volume
    // is bounded by the distinct-content population, not the corpus size
    // (the naive form's per-shingle pair volume grows with the SQUARE of
    // duplicate multiplicity: at the ×100 replica rung it spilled >70 GB
    // and died; collapsed, the same stage is base-scale).
    val mem = dupGroups(s, d)
    val base = shingled(s, d)
      .where(size(col("hs")) > 0)
      .join(delegateIds(s, d), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("n"))
    val ex = base.select(col("doc_id"), explode(col("hs")).as("hsh"))
    val counts = ex.select(col("doc_id").as("a_id"), col("hsh"))
      .join(ex.select(col("doc_id").as("b_id"), col("hsh")), Seq("hsh"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("i"))
    val sizes = base.select(col("doc_id"), col("n"))
    val dpairs = counts
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .as("jaccard"))
      .where(col("jaccard") >= 0.5)
    // Cross-group member pairs inherit their delegates' jaccard exactly
    // (identical shingle sets); within-group pairs are exact duplicates at
    // jaccard i/i = 1.0 (IEEE x/x is exactly 1.0 for any finite count),
    // matching the oracle's arithmetic bit-for-bit.
    expandDelegatePairs(dpairs, mem).unionByName(
      withinGroupPairs(mem,
        delegateIds(s, d).select(col("doc_id").as("gid"))
          .withColumn("jaccard", lit(1.0))))
  }

  /** Near-dup cluster labels (id, lab) — the converged connected
    * components over [[ngramPairs]], memoized per directory. Shared by
    * q_dedup_cluster and the curation pipeline.
    */
  private[operators] def clusterLabels(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.Caches.getOrElseUpdate(
      s"dup-cluster-labels:$d:${graft.Caches.fingerprint(s, d)}",
      GraphOps.connectedComponents(ngramPairs(s, d), "a_id", "b_id"))

  /** Exploded (doc_id, hsh) shingle postings — shared by the decon join
    * and the curation pipeline.
    */
  private[operators] def postings(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    shingled(s, d).where(size(col("hs")) > 0)
      .select(col("doc_id"), explode(col("hs")).as("hsh"))

  /** Contaminated training doc ids (>= minShared distinct shingles shared
    * with any doc_id < benchMax benchmark doc).
    */
  private[operators] def contaminatedIds(s: org.apache.spark.sql.SparkSession,
      d: String, benchMax: Int = 10, minShared: Long = 3L): DataFrame = {
    val ex = postings(s, d)
    val bench = ex.where(col("doc_id") < benchMax)
      .select(col("doc_id").as("bench_id"), col("hsh"))
    ex.where(col("doc_id") >= benchMax)
      .join(broadcast(bench), Seq("hsh"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select("doc_id").distinct()
  }

  /** Rolling 10-token-window hash expressions over the token-hash array
    * th — fold of (acc·8191 + th[i+j]) % P, j = 0..9 — shared by the
    * copy-span pair query in both dialects. (The 3-gram shingles live in
    * TextHash; the 10-gram roll is span-dedup-specific.)
    */
  private def spanRoll(el: Int => String): String =
    (1 until 10).foldLeft(el(0))((acc, j) => s"($acc * 8191 + ${el(j)}) % $P")

  private val spanSparkExpr: String =
    s"CASE WHEN size(th) < 10 THEN array() ELSE " +
      s"element_at(transform(array(th), t -> array_distinct(transform(" +
      s"sequence(1, size(t) - 9), i -> ${spanRoll(j => s"element_at(t, i + $j)")}))), 1) END"

  private val spanDuckExpr: String =
    s"CASE WHEN len(th) < 10 THEN []::BIGINT[] ELSE " +
      s"list_distinct(list_transform(generate_series(1, len(th) - 9), " +
      s"i -> ${spanRoll(j => s"th[i + $j]")})) END"

  /** DuckDB connected-components fixpoint over `pairs` → `cc(doc_id,
    * cluster_id)` — continues [[ngramPairsDuck]] (requires WITH RECURSIVE).
    */
  private[operators] val ccDuck =
    """und AS (SELECT a_id AS u, b_id AS v FROM pairs
      |  UNION ALL SELECT b_id AS u, a_id AS v FROM pairs),
      |walk AS (
      |  SELECT u AS node, u AS lab FROM (SELECT DISTINCT u FROM und) du
      |  UNION
      |  SELECT e.v AS node, w.lab FROM walk w JOIN und e ON e.u = w.node),
      |cc AS (SELECT node AS doc_id, min(lab) AS cluster_id
      |  FROM walk GROUP BY 1)""".stripMargin

  /** DuckDB CTE chain continuing `pairs(a_id, b_id, …)` through `iters`
    * unrolled fixed-point PageRank rounds to `r{iters}(node, r)` plus
    * `deg(u, deg)` — the oracle half of [[GraphOps.pageRank]]. The
    * iteration count is FIXED, so no recursion is needed: each round is a
    * plain CTE referencing the previous one, and every quantity is
    * BIGINT arithmetic (`//` here ≡ Spark's `div` on non-negative
    * operands), which is what makes an iterative numeric operator
    * hash-comparable across engines.
    */
  private[operators] def pageRankDuck(iters: Int, scale: Long): String = {
    val base = s"(15 * $scale) // (100 * (SELECT n FROM nn))"
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (SELECT e.v AS node,
         |    $base + (85 * sum(p.r // d.deg)) // 100 AS r
         |  FROM r${k - 1} p JOIN und e ON e.u = p.node
         |    JOIN deg d ON d.u = p.node
         |  GROUP BY 1)"""
    }.mkString(",\n")
    s"""und AS (SELECT a_id AS u, b_id AS v FROM pairs
       |  UNION ALL SELECT b_id AS u, a_id AS v FROM pairs),
       |deg AS (SELECT u, count(*) AS deg FROM und GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT u AS node, $scale // (SELECT n FROM nn) AS r FROM deg),
       |$rounds"""
  }

  /** DuckDB CTE chain ending in `cal(a_id, b_id, n_eq, est_jaccard,
    * jaccard)` — banded-MinHash candidate pairs with both the
    * 16-component estimate and the exact shingle-set Jaccard, shared by
    * q_minhash_calibration and q_minhash_sweep.
    */
  private[operators] val calibrationDuck: String = {
    val mh = minhashExprs.map { case (j, _, duck) => f"$duck AS mh$j%02d" }
      .mkString(",\n    ")
    val bands = (0 until 4).map { g =>
      val ks = (4 * g until 4 * g + 4).map(j => f"mh$j%02d").mkString(", ")
      s"concat_ws(',', $ks) AS bk$g"
    }.mkString(",\n    ")
    val mhArr = (0 until 16).map(j => f"mh$j%02d").mkString("[", ", ", "]")
    val orJoin = (0 until 4).map(g => s"a.bk$g = b.bk$g").mkString(" OR ")
    s"""$shingledDuck,
       |m AS (SELECT doc_id, hs,
       |    $mh
       |  FROM h WHERE len(hs) > 0),
       |sig AS (SELECT doc_id, hs, $mhArr AS mharr,
       |    $bands
       |  FROM m),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($orJoin)),
       |sc AS (SELECT c.a_id, c.b_id,
       |    CAST(list_sum(list_transform(generate_series(1, 16),
       |      i -> CASE WHEN x.mharr[i] = y.mharr[i] THEN 1 ELSE 0 END))
       |      AS BIGINT) AS n_eq,
       |    len(list_intersect(x.hs, y.hs)) AS i,
       |    len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)) AS u
       |  FROM cand c JOIN sig x ON c.a_id = x.doc_id
       |              JOIN sig y ON c.b_id = y.doc_id),
       |cal AS (SELECT a_id, b_id, n_eq, n_eq / 16.0 AS est_jaccard,
       |    i::DOUBLE / u AS jaccard
       |  FROM sc WHERE u > 0)""".stripMargin
  }

  /** Spark: banded-MinHash candidate pairs with estimate + exact Jaccard
    * `(a_id, b_id, n_eq, est_jaccard, jaccard)` — the shared frame under
    * q_minhash_calibration and q_minhash_sweep. Ids-only through the
    * band-bucket pair shuffle; shingle sets and signatures join back per
    * side.
    */
  private[graft] def calibrationPairs(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    // memoized + persisted: the calibration report and the threshold
    // sweep read the identical pair frame — the banded-signature build
    // is the expensive half of both queries
    graft.Caches.getOrElseUpdate(
      s"minhash-cal:$d:${graft.Caches.fingerprint(s, d)}",
      calibrationPairsUncached(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def calibrationPairsUncached(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    // Collapsed (see dupGroups): candidates + the hs/mharr verify run over
    // delegates; within-group pairs are identical-signature candidates by
    // construction (all 4 bands equal) at n_eq 16, est 1.0, jaccard 1.0.
    val mem = dupGroups(s, d)
    val sig = minhashSigs(s, d).where(size(col("hs")) > 0)
      .join(delegateIds(s, d), Seq("doc_id"), "left_semi")
      .withColumn("mharr", array((0 until 16).map(j => col(f"mh$j%02d")): _*))
    val withBands = sig.withColumn("bands", array(
      (0 until 4).map { g =>
        struct(lit(g).as("g"),
          concat_ws(",",
            (4 * g until 4 * g + 4).map(j => col(f"mh$j%02d")): _*).as("k"))
      }: _*))
    val exploded = withBands
      .select(col("doc_id"), explode(col("bands")).as("band"))
      .select(col("doc_id"), col("band.g").as("g"), col("band.k").as("k"))
      .repartition(col("g"), col("k"))
    val cand = exploded.select(col("doc_id").as("a_id"), col("g"), col("k"))
      .join(exploded.select(col("doc_id").as("b_id"), col("g"), col("k")),
        Seq("g", "k"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
    val side = sig.select(col("doc_id"), col("hs"), col("mharr"))
    val i = size(array_intersect(col("a_hs"), col("b_hs")))
    val u = size(col("a_hs")) + size(col("b_hs")) - i
    val dpairs = cand
      .join(side.select(col("doc_id").as("a_id"), col("hs").as("a_hs"),
        col("mharr").as("a_mh")), Seq("a_id"))
      .join(side.select(col("doc_id").as("b_id"), col("hs").as("b_hs"),
        col("mharr").as("b_mh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("aggregate(zip_with(a_mh, b_mh, (x, y) -> " +
          "CASE WHEN x = y THEN 1L ELSE 0L END), 0L, (a, x) -> a + x)")
          .as("n_eq"),
        (i.cast("double") / u).as("jaccard"), u.as("u"))
      .where(col("u") > 0)
      .select(col("a_id"), col("b_id"), col("n_eq"),
        (col("n_eq") / lit(16.0)).as("est_jaccard"), col("jaccard"))
    expandDelegatePairs(dpairs, mem)
      .unionByName(withinGroupPairs(mem,
        delegateIds(s, d).select(col("doc_id").as("gid"))
          .withColumn("n_eq", lit(16L))
          .withColumn("est_jaccard", lit(1.0))
          .withColumn("jaccard", lit(1.0))))
  }

  /** DuckDB CTE chain ending in `pairs(a_id, b_id, jaccard)` — the oracle
    * half of [[ngramPairs]], shared by q_dedup_ngram and q_dedup_cluster.
    */
  private[operators] val ngramPairsDuck =
    s"""$shingledDuck,
       |b AS (SELECT doc_id, hs FROM h WHERE len(hs) > 0),
       |e AS (SELECT doc_id, unnest(hs) AS hsh FROM b),
       |c AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
       |  FROM e a JOIN e b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |n AS (SELECT doc_id, len(hs) AS n FROM b),
       |pairs AS (SELECT c.a_id, c.b_id,
       |    c.i::DOUBLE / (x.n + y.n - c.i) AS jaccard
       |  FROM c JOIN n x ON c.a_id = x.doc_id JOIN n y ON c.b_id = y.doc_id
       |  WHERE c.i::DOUBLE / (x.n + y.n - c.i) >= 0.5)""".stripMargin

  val entries: Seq[Q] = Seq(

    // Exact dedup: survivor id + multiplicity per distinct text.
    // 100 TB note: group by sha2(text, 256) instead of the raw text to keep
    // shuffle rows narrow; semantics identical modulo 2^-256 collisions.
    Q("q_dedup_exact",
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    },

    // N-gram Jaccard near-dup pairs via an INVERTED INDEX on the shingle
    // hash: explode (doc, shingle-hash), self-join on the hash, count
    // co-occurrences per pair -> |A∩B|, then Jaccard from the stored set
    // sizes. Complete recall (every pair sharing >= 1 shingle is a
    // candidate — no blocking-scheme soundness argument needed) and the
    // scalable shape: one shuffle keyed on the shingle hash, no per-pair
    // set intersections (measured 24 s -> ~2 s at sf0.1 vs the banded
    // array_intersect formulation). At 100 TB, hot shingles (boilerplate)
    // would be dropped by an idf-style frequency cap before the join.
    Q("q_dedup_ngram",
      s"""WITH $ngramPairsDuck
         |SELECT a_id, b_id, jaccard FROM pairs
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      ngramPairs(s, d).orderBy("a_id", "b_id")
    },

    // DUP-CLUSTER RESOLUTION: pairwise dedup emits edges; the keep/drop
    // decision needs components — A~B and B~C put A,B,C in ONE cluster
    // with one canonical survivor (min doc_id), even when A~C was never a
    // candidate pair. Spark side: GraphOps.connectedComponents (min-label
    // propagation, one shuffle per round, rounds = cluster diameter ~2-4
    // for quasi-clique dup groups). Oracle: the identical fixpoint as a
    // recursive CTE. Output covers every doc in >= 1 pair; isolated docs
    // are trivially their own cluster and stay out of both sides.
    Q("q_dedup_cluster",
      s"""WITH RECURSIVE $ngramPairsDuck,
         |$ccDuck
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS n_members,
         |  doc_id = cluster_id AS is_canonical
         |FROM cc ORDER BY doc_id""".stripMargin) { (s, d) =>
      // the fixpoint loop runs driver-side actions — clusterLabels
      // memoizes the converged result per directory so repeated calls
      // (bench warm passes) reuse it instead of re-iterating
      val labels = clusterLabels(s, d)
      val w = Window.partitionBy("cluster_id")
      labels.select(col("id").as("doc_id"), col("lab").as("cluster_id"))
        .withColumn("n_members", count(lit(1)).over(w))
        .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    },

    // KEEP-BEST SURVIVOR SELECTION: the cluster-resolution policy that
    // keeps the highest-QUALITY member (longest text here; any scalar
    // quality score slots in) instead of q_dedup_cluster's min-id
    // canonical — the policy a production dedup actually ships, since
    // near-dup groups usually contain one full document plus truncated or
    // boilerplate-wrapped copies. Tie → min doc_id keeps the choice
    // deterministic. One extra window over the converged labels (keyed on
    // cluster_id, the same shuffle key the labels already carry); emits
    // the non-survivor → survivor mapping a downstream rewrite joins on.
    Q("q_dedup_survivor",
      s"""WITH RECURSIVE $ngramPairsDuck,
         |$ccDuck,
         |m AS (SELECT cc.doc_id, cc.cluster_id, d.n_chars
         |  FROM cc JOIN documents d USING (doc_id)),
         |s AS (SELECT cluster_id, doc_id AS survivor_id FROM (
         |    SELECT cluster_id, doc_id,
         |      row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM m) t
         |  WHERE rn = 1)
         |SELECT m.doc_id, m.cluster_id, m.n_chars, s.survivor_id,
         |  m.doc_id = s.survivor_id AS is_survivor
         |FROM m JOIN s USING (cluster_id) ORDER BY m.doc_id""".stripMargin) { (s, d) =>
      val labels = clusterLabels(s, d)
        .select(col("id").as("doc_id"), col("lab").as("cluster_id"))
      val m = labels.join(
        Tables.documents(s, d).select("doc_id", "n_chars"), Seq("doc_id"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(desc("n_chars"), asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      m.withColumn("survivor_id", first("doc_id").over(w))
        .select(col("doc_id"), col("cluster_id"), col("n_chars"),
          col("survivor_id"),
          (col("doc_id") === col("survivor_id")).as("is_survivor"))
        .orderBy("doc_id")
    },

    // Pair-similarity histogram: near-dup pairs per 0.05 jaccard band —
    // the threshold-tuning curve (where does the pair mass sit relative
    // to the 0.5 cut; a spike just above threshold means the cut is
    // load-bearing and worth a sensitivity pass). Band index floors an
    // exact IEEE division; 1.0 folds into the top band so bands
    // partition [0.5, 1.0].
    Q("q_jaccard_hist",
      s"""WITH $ngramPairsDuck
         |SELECT CAST(least(9, floor((jaccard - 0.5) / 0.05)) AS BIGINT)
         |    AS band,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  min(jaccard) AS lo, max(jaccard) AS hi
         |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      ngramPairs(s, d)
        .select(least(lit(9), floor((col("jaccard") - 0.5) / 0.05))
          .cast("long").as("band"), col("jaccard"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_pairs"),
          min("jaccard").as("lo"), max("jaccard").as("hi"))
        .orderBy("band")
    },

    // Near-dup DEGREE distribution: how many partners each duplicated doc
    // has, rolled up to (degree → n_docs) — the graph-shape diagnostic
    // read before cluster resolution (a heavy tail of high-degree nodes
    // means template families and predicts connected-component blowup;
    // all-degree-1 means simple pair dedup suffices). Reuses the shared
    // pair frame; degrees via one union-explode + count keyed on doc_id.
    Q("q_dup_degree",
      s"""WITH $ngramPairsDuck,
         |deg AS (SELECT doc_id, count(*) AS degree FROM (
         |    SELECT a_id AS doc_id FROM pairs
         |    UNION ALL SELECT b_id AS doc_id FROM pairs) u
         |  GROUP BY 1)
         |SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
         |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin) { (s, d) =>
      val p = ngramPairs(s, d)
      p.select(col("a_id").as("doc_id"))
        .unionByName(p.select(col("b_id").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_docs"))
        .orderBy("degree")
    },

    // Same inverted-index join with the HOT-SHINGLE FREQUENCY CAP the plain
    // variant only documents (VERDICT r1 next-round #9): shingles appearing
    // in more than maxDf documents are dropped BEFORE the self-join, and
    // set sizes are recomputed over the surviving postings so Jaccard stays
    // well-defined on the filtered shingle space. At 100 TB a single
    // boilerplate shingle (page header, license text) makes the self-join
    // quadratic in its document frequency — the cap bounds each hash
    // bucket's contribution to maxDf², at the cost of recall for pairs
    // whose ONLY shared shingles are boilerplate (exactly the pairs that
    // are boilerplate-similar, not content-similar — the trade the
    // reference dedup literature makes; see DedupSpec for the recall test).
    // The hot set is tiny by construction (≤ postings/maxDf ids) → one
    // broadcast anti-join, no extra shuffle of the postings.
    Q("q_dedup_ngram_capped",
      s"""WITH $shingledDuck,
         |b AS (SELECT doc_id, hs FROM h WHERE len(hs) > 0),
         |e0 AS (SELECT doc_id, unnest(hs) AS hsh FROM b),
         |hot AS (SELECT hsh FROM e0 GROUP BY 1 HAVING count(*) > $NgramMaxDf),
         |e AS (SELECT * FROM e0 WHERE hsh NOT IN (SELECT hsh FROM hot)),
         |n AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
         |c AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |  FROM e a JOIN e b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT c.a_id, c.b_id,
         |  c.i::DOUBLE / (x.n + y.n - c.i) AS jaccard
         |FROM c JOIN n x ON c.a_id = x.doc_id JOIN n y ON c.b_id = y.doc_id
         |WHERE c.i::DOUBLE / (x.n + y.n - c.i) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      // the PAIR frame is the built dedup index (same index-build-once
      // discipline as the uncapped ngramPairs) — tiny (true near-dups
      // only), while its build is the quadratic half of the query.
      // Collapsed build: postings/df/self-join at delegate scale (the
      // naive per-doc form re-pairs every clone family m² times; see
      // dupGroups). key carries the Jaccard threshold too (ADVICE r8):
      // a caller at a different threshold must not be served these pairs
      graft.Caches.getOrElseUpdate(
        s"capped-pairs:$d:${graft.Caches.fingerprint(s, d)}:$NgramMaxDf:0.5",
        cappedNgramPairsCollapsed(s, d, Left(NgramMaxDf.toLong))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        .orderBy("a_id", "b_id")
    },

    // The SAME hot-shingle cap with the threshold as a df FRACTION of the
    // corpus size — the form that survives corpus growth (an absolute cap
    // of 5 is meaningless at 100 TB; 1 % of documents is the same
    // "boilerplate" statement at any scale). Corpus size N is one 1-row
    // aggregate broadcast into the threshold; everything downstream is the
    // identical capped inverted-index join. At sf0.01 ceil(0.01·N) = 5
    // reproduces q_dedup_ngram_capped exactly (DedupSpec pins it); at
    // sf0.1 the cap self-adjusts to 50.
    Q("q_dedup_ngram_fcapped",
      s"""WITH $shingledDuck,
         |b AS (SELECT doc_id, hs FROM h WHERE len(hs) > 0),
         |e0 AS (SELECT doc_id, unnest(hs) AS hsh FROM b),
         |cap AS (SELECT CAST(ceil($NgramMaxDfFrac * count(*)) AS BIGINT)
         |    AS maxdf FROM b),
         |hot AS (SELECT hsh FROM e0 GROUP BY 1
         |  HAVING count(*) > (SELECT maxdf FROM cap)),
         |e AS (SELECT * FROM e0 WHERE hsh NOT IN (SELECT hsh FROM hot)),
         |n AS (SELECT doc_id, count(*) AS n FROM e GROUP BY 1),
         |c AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |  FROM e a JOIN e b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT c.a_id, c.b_id,
         |  c.i::DOUBLE / (x.n + y.n - c.i) AS jaccard
         |FROM c JOIN n x ON c.a_id = x.doc_id JOIN n y ON c.b_id = y.doc_id
         |WHERE c.i::DOUBLE / (x.n + y.n - c.i) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      // pair frame memoized like the absolute-cap variant — at the
      // fractional cap (df <= 50 at sf0.1) the pair emission is the
      // suite's heaviest stage, and it rebuilds the same tiny index.
      // Collapsed build is load-bearing HERE specifically: the fractional
      // cap scales with N, so clone-inflated postings stay UNDER it and
      // the naive self-join inherits the full m² blowup (measured fatal
      // at the ×100 replica rung). threshold in the key for the same
      // reason as capped-pairs above
      graft.Caches.getOrElseUpdate(
        s"fcapped-pairs:$d:${graft.Caches.fingerprint(s, d)}:$NgramMaxDfFrac:0.5",
        cappedNgramPairsCollapsed(s, d, Right(NgramMaxDfFrac))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        .orderBy("a_id", "b_id")
    },

    // 16-permutation MinHash signature per document.
    Q("q_dedup_minhash_sig", {
      val cols = minhashExprs
        .map { case (j, _, duck) => f"$duck AS mh$j%02d" }.mkString(",\n  ")
      s"""WITH $shingledDuck
         |SELECT doc_id,
         |  $cols
         |FROM h ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      minhashSigs(s, d).drop("hs").orderBy("doc_id")
    },

    // MinHash-LSH candidate pairs (4 bands x 4 rows), verified by exact
    // Jaccard >= 0.5. Spark explodes band keys into rows and equi-joins;
    // the oracle expresses the identical banding as an OR-of-bands join
    // (fine at sf0.01; the exploded equi-join is the scale path).
    Q("q_dedup_minhash_pairs", {
      val mh = minhashExprs.map { case (j, _, duck) => f"$duck AS mh$j%02d" }
        .mkString(",\n    ")
      val bands = (0 until 4).map { g =>
        val ks = (4 * g until 4 * g + 4).map(j => f"mh$j%02d").mkString(", ")
        s"concat_ws(',', $ks) AS bk$g"
      }.mkString(",\n    ")
      val orJoin = (0 until 4).map(g => s"a.bk$g = b.bk$g").mkString(" OR ")
      s"""WITH $shingledDuck,
         |m AS (SELECT doc_id, hs,
         |    $mh
         |  FROM h WHERE len(hs) > 0),
         |sig AS (SELECT doc_id, hs,
         |    $bands
         |  FROM m),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($orJoin)),
         |j AS (SELECT c.a_id, c.b_id,
         |    len(list_intersect(x.hs, y.hs)) AS i,
         |    len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs)) AS u
         |  FROM cand c JOIN sig x ON c.a_id = x.doc_id
         |              JOIN sig y ON c.b_id = y.doc_id)
         |SELECT a_id, b_id, i::DOUBLE / u AS jaccard
         |FROM j WHERE u > 0 AND i::DOUBLE / u >= 0.5
         |ORDER BY a_id, b_id""".stripMargin
    }) { (s, d) =>
      // Exact verify runs on shingle hashes (see q_dedup_ngram perf note);
      // candidate pairs travel id-only, the hash arrays join back after
      // the distinct — payload arrays never go through the pair shuffle.
      // Collapsed (see dupGroups): banding, bucket pairing, and the
      // hs-array verify all run over delegates — the naive verify joined
      // KB-sized shingle arrays onto a candidate set that grows m² under
      // clone multiplicity (hundreds of GB at the ×100 rung); within a
      // group every pair shares all 4 bands and sits at jaccard 1.0.
      val mem = dupGroups(s, d)
      val sig = minhashSigs(s, d).where(size(col("hs")) > 0)
        .join(delegateIds(s, d), Seq("doc_id"), "left_semi")
      val exploded = minhashBandsDelegates(s, d)
      val a = exploded.select(col("doc_id").as("a_id"), col("g"), col("k"))
      val b = exploded.select(col("doc_id").as("b_id"), col("g"), col("k"))
      val cand = a.join(b, Seq("g", "k"))
        .where(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
        .distinct()
      val hsOnly = sig.select(col("doc_id"), col("hs"))
      val i = size(array_intersect(col("a_hs"), col("b_hs")))
      val u = size(col("a_hs")) + size(col("b_hs")) - i
      val dpairs = cand
        .join(hsOnly.select(col("doc_id").as("a_id"), col("hs").as("a_hs")), Seq("a_id"))
        .join(hsOnly.select(col("doc_id").as("b_id"), col("hs").as("b_hs")), Seq("b_id"))
        .select(col("a_id"), col("b_id"),
          (i.cast("double") / u).as("jaccard"), u.as("u"))
        .where(col("u") > 0 && col("jaccard") >= 0.5)
        .drop("u")
      expandDelegatePairs(dpairs, mem)
        .unionByName(withinGroupPairs(mem,
          delegateIds(s, d).select(col("doc_id").as("gid"))
            .withColumn("jaccard", lit(1.0))))
        .orderBy("a_id", "b_id")
    },

    // FUZZY ENTITY MATCHING (edit distance with blocking): near-identical
    // entity names — the record-linkage flavor of dedup, where the unit
    // is a short string, not a document. Shape: distinct names first
    // (2000 parts → 64 names: entity resolution always dedups exact
    // before fuzzy), BLOCK on the head noun (last word) so candidate
    // pairs are bounded per block and the join is an equi-join on the
    // block key — never an all-pairs levenshtein — then the exact edit
    // distance ≤ 4 filter. Both engines implement standard Levenshtein,
    // so the distance is integer-identical.
    Q("q_fuzzy_pairs",
      """WITH nm AS (SELECT DISTINCT p_name FROM part),
        |t AS (SELECT p_name, regexp_extract(p_name, '(\S+)$', 1) AS blk
        |  FROM nm),
        |p AS (SELECT a.p_name AS a_name, b.p_name AS b_name, a.blk,
        |    levenshtein(a.p_name, b.p_name) AS lev
        |  FROM t a JOIN t b ON a.blk = b.blk AND a.p_name < b.p_name)
        |SELECT a_name, b_name, blk, CAST(lev AS BIGINT) AS lev
        |FROM p WHERE lev <= 4 ORDER BY a_name, b_name""".stripMargin) { (s, d) =>
      val t = Tables.part(s, d).select("p_name").distinct()
        .withColumn("blk", regexp_extract(col("p_name"), "(\\S+)$", 1))
      val a = t.select(col("p_name").as("a_name"), col("blk"))
      val b = t.select(col("p_name").as("b_name"), col("blk"))
      a.join(b, Seq("blk"))
        .where(col("a_name") < col("b_name"))
        .withColumn("lev", levenshtein(col("a_name"), col("b_name")).cast("long"))
        .where(col("lev") <= 4)
        .select("a_name", "b_name", "blk", "lev")
        .orderBy("a_name", "b_name")
    },

    // MINHASH CALIBRATION: for every LSH candidate pair, the signature's
    // Jaccard ESTIMATE (matching components / 16) against the exact
    // shingle-set Jaccard — the report that answers "how many components
    // and bands does this corpus need" before committing to a signature
    // size (estimator variance ~ J(1−J)/k, so a fat error column at the
    // threshold means k is too small). Candidate generation is the
    // banded equi-join (ids only through the pair shuffle); signatures
    // and shingle sets join back per side. No threshold filter — the
    // calibration needs the below-cut candidates too.
    Q("q_minhash_calibration",
      s"""WITH $calibrationDuck
         |SELECT a_id, b_id, n_eq, est_jaccard, jaccard,
         |  abs(est_jaccard - jaccard) AS abs_err
         |FROM cal ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      calibrationPairs(s, d)
        .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
        .select("a_id", "b_id", "n_eq", "est_jaccard", "jaccard", "abs_err")
        .orderBy("a_id", "b_id")
    },

    // THRESHOLD SWEEP over the calibration pairs: at each candidate
    // dedup threshold, how often does the 16-component estimate agree
    // with the exact Jaccard about which side of the cut a pair falls
    // on? (tp/fp/fn + precision/recall per threshold — the table that
    // picks the production threshold AND tells you whether 16
    // components suffice near it.) The thresholds explode map-side onto
    // the calibration frame (never a join); every comparison is between
    // bit-identical doubles (n_eq/16 and i/u are the same integer
    // divisions in both engines), so the counts are exact.
    Q("q_minhash_sweep",
      s"""WITH $calibrationDuck,
         |th AS (SELECT unnest([CAST(0.3 AS DOUBLE), CAST(0.5 AS DOUBLE),
         |    CAST(0.7 AS DOUBLE)]) AS t)
         |SELECT t, tp, fp, fn,
         |  round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS prec,
         |  round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS rec
         |FROM (
         |  SELECT t,
         |    count(CASE WHEN est_jaccard >= t AND jaccard >= t THEN 1 END) AS tp,
         |    count(CASE WHEN est_jaccard >= t AND jaccard < t THEN 1 END) AS fp,
         |    count(CASE WHEN est_jaccard < t AND jaccard >= t THEN 1 END) AS fn
         |  FROM cal CROSS JOIN th GROUP BY 1) g
         |ORDER BY t""".stripMargin) { (s, d) =>
      val swept = calibrationPairs(s, d)
        .withColumn("t", explode(array(lit(0.3), lit(0.5), lit(0.7))))
        .groupBy("t")
        .agg(
          count(when(col("est_jaccard") >= col("t") &&
            col("jaccard") >= col("t"), 1)).as("tp"),
          count(when(col("est_jaccard") >= col("t") &&
            col("jaccard") < col("t"), 1)).as("fp"),
          count(when(col("est_jaccard") < col("t") &&
            col("jaccard") >= col("t"), 1)).as("fn"))
      swept.select(col("t"), col("tp"), col("fp"), col("fn"),
          round(col("tp").cast("double") /
            nullif(col("tp") + col("fp"), lit(0)), 6).as("prec"),
          round(col("tp").cast("double") /
            nullif(col("tp") + col("fn"), lit(0)), 6).as("rec"))
        .orderBy("t")
    },

    // INCREMENTAL dedup: drop each NEW document (odd doc_id as the batch
    // stand-in) that is an exact copy OR a banded-MinHash collision of a
    // SEEN document (even doc_id = the existing corpus). This is the
    // actual 100 TB production shape — a new crawl batch dedups against
    // the corpus WITHOUT re-pairing the corpus with itself: both probes
    // are equi-joins (text key / band key) of batch-sized left sides
    // against the corpus index, and intra-batch duplicates are
    // deliberately left to the batch-level operators above. At scale the
    // seen side is the persisted signature/band silver table; here both
    // sides derive from one corpus split.
    Q("q_dedup_incremental", {
      val mh = minhashExprs.map { case (j, _, duck) => f"$duck AS mh$j%02d" }
        .mkString(",\n    ")
      val bands = (0 until 4).map { g =>
        val ks = (4 * g until 4 * g + 4).map(j => f"mh$j%02d").mkString(", ")
        s"concat_ws(',', $ks) AS bk$g"
      }.mkString(",\n    ")
      val orJoin = (0 until 4).map(g => s"n.bk$g = s.bk$g").mkString(" OR ")
      s"""WITH $shingledDuck,
         |m AS (SELECT doc_id,
         |    $mh
         |  FROM h WHERE len(hs) > 0),
         |sig AS (SELECT doc_id,
         |    $bands
         |  FROM m),
         |nearhit AS (SELECT DISTINCT n.doc_id
         |  FROM sig n JOIN sig s
         |    ON n.doc_id % 2 = 1 AND s.doc_id % 2 = 0 AND ($orJoin)),
         |exacthit AS (SELECT DISTINCT n.doc_id
         |  FROM documents n JOIN documents s
         |    ON n.doc_id % 2 = 1 AND s.doc_id % 2 = 0 AND n.text = s.text)
         |SELECT doc_id FROM documents
         |WHERE doc_id % 2 = 1
         |  AND doc_id NOT IN (SELECT doc_id FROM nearhit)
         |  AND doc_id NOT IN (SELECT doc_id FROM exacthit)
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val newIds = col("doc_id") % 2 === 1
      val seenIds = col("doc_id") % 2 === 0
      // exact probe: batch texts semi-joined against the corpus text key
      // (at 100 TB: sha2(text,256) so the shuffle carries 32 bytes/row)
      val exactHit = docs.where(newIds).select("doc_id", "text")
        .join(docs.where(seenIds).select("text").distinct(),
          Seq("text"), "left_semi")
        .select("doc_id")
      val bandKeys = minhashBands(s, d)
      val nearHit = bandKeys.where(newIds)
        .join(bandKeys.where(seenIds).select("g", "k").distinct(),
          Seq("g", "k"), "left_semi")
        .select("doc_id").distinct()
      docs.where(newIds).select("doc_id")
        .join(exactHit, Seq("doc_id"), "left_anti")
        .join(nearHit, Seq("doc_id"), "left_anti")
        .orderBy("doc_id")
    },

    // COPY-SPAN PAIRS: documents sharing at least one 10-TOKEN window —
    // the token-level approximation of exact-substring dedup (long spans
    // copied between documents are what survives Jaccard-threshold dedup:
    // two long docs sharing a paragraph have low global Jaccard but a
    // real provenance link). 10-gram hashes roll over the SAME persisted
    // token-hash arrays the 3-gram shingles use (pure BIGINT multiply-add
    // per window, no re-tokenization), and the pair generation is the
    // same inverted-index equi-join — n_spans = count of distinct shared
    // 10-gram hashes ≈ shared-span length in tokens minus 9.
    Q("q_dedup_span",
      s"""WITH $shingledDuck,
         |sp AS (SELECT doc_id, $spanDuckExpr AS sh FROM h0),
         |e10 AS (SELECT doc_id, unnest(sh) AS hsh FROM sp WHERE len(sh) > 0),
         |sps AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    count(*) AS n_spans
         |  FROM e10 a JOIN e10 b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, n_spans FROM sps
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      // pair frame memoized like the capped Jaccard variants — the
      // 10-gram roll + near-unique-key aggregation is the suite's most
      // compute-bound stage and rebuilds an identical index every run
      // Collapsed build (see dupGroups): span sets are a pure function of
      // th, so the rolling-hash index runs over delegates and the clone
      // fan-out happens output-bound at the end — the naive form emits
      // every clone pair once PER SHARED SPAN before the (a,b) rollup,
      // i.e. Σ n_spans rows, which under ×m multiplicity is m²·|sh| per
      // family (billions at the ×100 rung); collapsed, each expanded pair
      // is emitted exactly once with its n_spans carried.
      graft.Caches.getOrElseUpdate(
        s"span-pairs:$d:${graft.Caches.fingerprint(s, d)}", {
          val mem = dupGroups(s, d)
          val dsh = shingled(s, d)
            .join(delegateIds(s, d), Seq("doc_id"), "left_semi")
            .select(col("doc_id"), expr(spanSparkExpr).as("sh"))
            .where(size(col("sh")) > 0)
          val ex = dsh.select(col("doc_id"), explode(col("sh")).as("hsh"))
          val dpairs = pairCounts(ex).withColumnRenamed("n_shared", "n_spans")
          val eligible = dsh.select(col("doc_id").as("gid"),
            size(col("sh")).cast("long").as("n_spans"))
          expandDelegatePairs(dpairs, mem)
            .unionByName(withinGroupPairs(mem, eligible))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        })
        .orderBy("a_id", "b_id")
    },

    // BENCHMARK DECONTAMINATION: flag training documents sharing >= 3
    // distinct shingles with any document of a held-out evaluation set
    // (stand-in: doc_id < 10) — the n-gram-overlap contamination check
    // every LLM training pipeline runs before training. Same inverted-
    // index shape as the dedup joins: benchmark postings are TINY (the
    // eval set) → broadcast equi-join on the shingle hash, count distinct
    // shared shingles per (train, bench) pair, keep the max-overlap bench
    // doc per train doc. No train-train pairing anywhere in the plan.
    Q("q_text_decontaminate",
      s"""WITH $shingledDuck,
         |b AS (SELECT doc_id, hs FROM h WHERE len(hs) > 0),
         |e AS (SELECT doc_id, unnest(hs) AS hsh FROM b),
         |bench AS (SELECT doc_id AS bench_id, hsh FROM e WHERE doc_id < 10),
         |train AS (SELECT doc_id, hsh FROM e WHERE doc_id >= 10),
         |ov AS (SELECT t.doc_id, bn.bench_id, count(*) AS n_shared
         |  FROM train t JOIN bench bn ON t.hsh = bn.hsh
         |  GROUP BY 1, 2),
         |best AS (SELECT doc_id, bench_id, n_shared FROM (
         |    SELECT doc_id, bench_id, n_shared,
         |      row_number() OVER (PARTITION BY doc_id
         |        ORDER BY n_shared DESC, bench_id) AS rn
         |    FROM ov) t WHERE rn = 1)
         |SELECT doc_id, bench_id, n_shared, n_shared >= 3 AS contaminated
         |FROM best ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ex = shingled(s, d).where(size(col("hs")) > 0)
        .select(col("doc_id"), explode(col("hs")).as("hsh"))
      val bench = ex.where(col("doc_id") < 10)
        .select(col("doc_id").as("bench_id"), col("hsh"))
      val ov = ex.where(col("doc_id") >= 10)
        .join(broadcast(bench), Seq("hsh"))
        .groupBy("doc_id", "bench_id")
        .agg(count(lit(1)).as("n_shared"))
      val w = Window.partitionBy("doc_id")
        .orderBy(desc("n_shared"), asc("bench_id"))
      ov.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("bench_id"), col("n_shared"),
          (col("n_shared") >= 3).as("contaminated"))
        .orderBy("doc_id")
    },

    // BLOOM-PREFILTERED DECONTAMINATION: the same benchmark-overlap check
    // with the candidate generation Spark's own runtime filtering uses at
    // scale — ONE bloom filter built over the benchmark postings (size
    // pinned by numBits, independent of corpus size) ships to executors
    // as a literal and prunes the training postings AT THE SCAN, so only
    // might-contain survivors flow into the exact join. False positives
    // are discarded by the join; false negatives are impossible; the
    // result is byte-identical to the unfiltered plan — which is why the
    // DuckDB oracle is plain exact SQL. At 100 TB this is the difference
    // between shuffling the full training postings stream and shuffling
    // ~the contamination rate of it. Benchmark slice: doc_id 10-59
    // (disjoint from q_text_decontaminate's eval set; benchmark suites
    // are fixed-size, so the broadcast side stays bounded at any corpus
    // scale).
    Q("q_decontaminate_bloom",
      s"""WITH $shingledDuck,
         |b AS (SELECT doc_id, hs FROM h WHERE len(hs) > 0),
         |e AS (SELECT doc_id, unnest(hs) AS hsh FROM b),
         |bench AS (SELECT doc_id AS bench_id, hsh FROM e
         |  WHERE doc_id BETWEEN 10 AND 59),
         |train AS (SELECT doc_id, hsh FROM e
         |  WHERE doc_id < 10 OR doc_id > 59),
         |ov AS (SELECT t.doc_id, bn.bench_id, count(*) AS n_shared
         |  FROM train t JOIN bench bn ON t.hsh = bn.hsh
         |  GROUP BY 1, 2),
         |best AS (SELECT doc_id, bench_id, n_shared FROM (
         |    SELECT doc_id, bench_id, n_shared,
         |      row_number() OVER (PARTITION BY doc_id
         |        ORDER BY n_shared DESC, bench_id) AS rn
         |    FROM ov) t WHERE rn = 1)
         |SELECT doc_id, bench_id, n_shared, n_shared >= 3 AS contaminated
         |FROM best ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ex = shingled(s, d).where(size(col("hs")) > 0)
        .select(col("doc_id"), explode(col("hs")).as("hsh"))
      val isBench = col("doc_id").between(10, 59)
      val bench = ex.where(isBench)
        .select(col("doc_id").as("bench_id"), col("hsh"))
      // one bounded driver round-trip: the filter is numBits/8 bytes by
      // construction (128 KiB here) no matter how many postings fed it
      val bloom = graft.functions.Bloom.buildFilter(
        bench.select("hsh"), expectedItems = 1L << 16, numBits = 1L << 20)
      val train = ex.where(!isBench)
      val pruned = bloom match {
        case Some(bf) =>
          train.where(graft.functions.Bloom.mightContain(bf, col("hsh")))
        case None => train.where(lit(false)) // empty benchmark → no overlap
      }
      val ov = pruned.join(broadcast(bench), Seq("hsh"))
        .groupBy("doc_id", "bench_id")
        .agg(count(lit(1)).as("n_shared"))
      val w = Window.partitionBy("doc_id")
        .orderBy(desc("n_shared"), asc("bench_id"))
      ov.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("bench_id"), col("n_shared"),
          (col("n_shared") >= 3).as("contaminated"))
        .orderBy("doc_id")
    },

    // BOILERPLATE SHARE (CCNet/C4-style common-content removal signal):
    // per-document fraction of shingles that are corpus boilerplate —
    // shingles present in more than ceil(frac·N) documents, the SAME
    // fractional df cap the capped dedup family uses. Complements
    // q_novelty (first-seen share — order-dependent provenance) and
    // q_text_repetition (WITHIN-doc duplication): this is the cross-doc
    // template signal a 100 TB curation pass thresholds on before
    // training. Computed as n_shingles − kept-postings count, so it
    // REUSES the memoized fraction-capped postings frame — the cap
    // already dropped exactly the boilerplate postings; no second
    // df pass exists in the plan.
    Q("q_boilerplate",
      s"""WITH $shingledDuck,
         |b AS (SELECT doc_id, hs FROM h WHERE len(hs) > 0),
         |e0 AS (SELECT doc_id, unnest(hs) AS hsh FROM b),
         |cap AS (SELECT CAST(ceil($NgramMaxDfFrac * count(*)) AS BIGINT)
         |    AS maxdf FROM b),
         |hot AS (SELECT hsh FROM e0 GROUP BY 1
         |  HAVING count(*) > (SELECT maxdf FROM cap)),
         |nk AS (SELECT doc_id, count(*) AS n_kept FROM e0
         |  WHERE hsh NOT IN (SELECT hsh FROM hot) GROUP BY 1)
         |SELECT b.doc_id, len(b.hs) AS n_shingles,
         |  len(b.hs) - coalesce(nk.n_kept, 0) AS n_common,
         |  round((len(b.hs) - coalesce(nk.n_kept, 0))::DOUBLE / len(b.hs),
         |    6) AS boilerplate_ratio
         |FROM b LEFT JOIN nk USING (doc_id) ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      val base = shingled(s, d).where(size(col("hs")) > 0)
        .select(col("doc_id"), size(col("hs")).cast("long").as("n_shingles"))
      val kept = fcappedPostings(s, d)
        .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
      val nCommon = col("n_shingles") - coalesce(col("n_kept"), lit(0L))
      base.join(kept, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_shingles"),
          nCommon.as("n_common"),
          round(nCommon.cast("double") / col("n_shingles"), 6)
            .as("boilerplate_ratio"))
        .orderBy("doc_id")
    },

    // 30-bit SimHash over distinct-token hashes (polyHash < 2^30, so every
    // bit position carries signal). Bit sums are generated as literal
    // expressions per bit — no nested-lambda cross-capture needed in
    // either dialect.
    Q("q_dedup_simhash", {
      val bitCols = (0 until 30).map { j =>
        val pw = 1L << j
        s"list_sum(list_transform(dth, h -> CASE WHEN (h // $pw) % 2 = 1 THEN 1 ELSE -1 END)) AS bs$j"
      }.mkString(",\n    ")
      val sum = (0 until 30).map { j =>
        val pw = 1L << j
        s"(CASE WHEN bs$j > 0 THEN $pw ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH $shingledDuck,
         |d0 AS (SELECT doc_id, list_distinct(th) AS dth FROM h0 WHERE len(th) > 0),
         |b AS (SELECT doc_id,
         |    $bitCols
         |  FROM d0)
         |SELECT doc_id, $sum AS simhash
         |FROM b ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      // distinct TOKEN hashes (not shingles); the shingled() barrier has
      // already materialized th, and the 30 bit sums + final signature
      // come from the one-pass codegen'd kernel (functions.SimHash30) —
      // the 30-fold HOF formulation re-walked every array 30 times with
      // an interpreted lambda and was the entire cost of this query.
      shingled(s, d)
        .where(size(col("th")) > 0)
        .select(col("doc_id"),
          graft.functions.ArrayOps.simHash30(array_distinct(col("th")))
            .as("simhash"))
        .orderBy("doc_id")
    },

    // Embedding-cosine near-dup pairs, blocked on the label bucket (the
    // given coarse partition — at scale this is the LSH/IVF cell id).
    // Cosine in double precision on both sides; the float32 builtin
    // list_cosine_similarity is deliberately NOT used in the oracle.
    Q("q_dedup_embedding",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) / (a.nrm * b.nrm) AS cosine
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(a.v, (x,i) -> x * b.v[i])) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val e = Similarity.vecs(s, d) // shared persisted (v, nrm) frame
      // Collapsed on exact vector content within the block (same pattern
      // as dupGroups for text; q_semdedup's delegate collapse for the
      // quantized space): the blocked self-join runs over one delegate
      // per distinct (label, v), so block-internal pair volume is bounded
      // by distinct vectors — the naive join carries two double arrays
      // per candidate row and grows m² under clone multiplicity.
      // label.isNotNull: Window.partitionBy treats NULL labels as EQUAL
      // (they'd group and emit within-group pairs) while the naive form
      // and the oracle equi-join on label drop NULL-label rows entirely —
      // NULL = NULL is not true in join semantics. Excluding them up
      // front makes the collapse and the join agree (latent on the test
      // data, which has no NULL labels, but semantics must not depend on
      // that).
      val mem = graft.Caches.getOrElseUpdate(
        s"vec-groups:$d:${graft.Caches.fingerprint(s, d)}",
        e.where(col("label").isNotNull)
          .withColumn("gid",
            min("vec_id").over(Window.partitionBy("label", "v")))
          .select(col("vec_id").as("doc_id"), col("gid"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val del = e.join(mem.where(col("doc_id") === col("gid"))
        .select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      val a = del.select(col("vec_id").as("a_id"), col("label"),
        col("v").as("av"), col("nrm").as("an"))
      val b = del.select(col("vec_id").as("b_id"), col("label"),
        col("v").as("bv"), col("nrm").as("bn"))
      // try_divide: zero-norm vectors -> NULL cosine (DuckDB /0 semantics),
      // not an ANSI crash; codegen'd primitive-loop dot (same fold order)
      val cos = try_divide(
        graft.functions.ArrayOps.dotDouble(col("av"), col("bv")),
        col("an") * col("bn"))
      val dpairs = a.join(b, Seq("label"))
        .where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), cos.as("cosine"))
        .where(col("cosine") >= 0.4)
      // Within-group pairs carry the delegate's SELF-cosine dot(v,v)/nrm²
      // — computed, not lit(1.0): sqrt rounding means nrm² ≠ Σx² in the
      // last ulp, and the oracle divides the same two quantities. NULL
      // (zero-norm) self-cosine fails the ≥ 0.4 filter, so zero vectors
      // never pair with their own clones — the oracle's NULL semantics.
      val selfCos = del.select(col("vec_id").as("gid"),
          try_divide(graft.functions.ArrayOps.dotDouble(col("v"), col("v")),
            col("nrm") * col("nrm")).as("cosine"))
        .where(col("cosine") >= 0.4)
      expandDelegatePairs(dpairs, mem)
        .unionByName(withinGroupPairs(mem, selfCos))
        .orderBy("a_id", "b_id")
    },

    // CONTENT NOVELTY: per document, the fraction of its distinct
    // shingles whose FIRST occurrence (min doc_id = corpus order here;
    // ingestion time in production) is this document — the "how much new
    // content does this doc contribute" score curation pipelines use to
    // rank near-threshold survivors. One hsh-partitioned window pass over
    // the shared postings frame (min(doc_id) over each shingle's
    // postings), then the per-doc rollup — the oracle's DISTINCT and
    // groupBy+join-back are dropped on the Spark side because `hs` is
    // array_distinct per document by construction (TextHash), so the
    // exploded (doc, hsh) stream is already duplicate-free and the
    // first-occurrence map can ride the same shuffle that would have fed
    // the join. Integer counts; only the final ratio is float.
    Q("q_novelty",
      s"""WITH $shingledDuck,
         |ed AS (SELECT DISTINCT doc_id, unnest(hs) AS hsh
         |  FROM h WHERE len(hs) > 0),
         |f AS (SELECT hsh, min(doc_id) AS first_doc FROM ed GROUP BY 1)
         |SELECT ed.doc_id, count(*) AS n_shingles,
         |  count(CASE WHEN f.first_doc = ed.doc_id THEN 1 END) AS n_novel,
         |  round(CAST(count(CASE WHEN f.first_doc = ed.doc_id THEN 1 END)
         |    AS DOUBLE) / count(*), 6) AS novelty
         |FROM ed JOIN f USING (hsh)
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val novel = count(when(col("first_doc") === col("doc_id"), 1))
      postings(s, d)
        .withColumn("first_doc",
          min("doc_id").over(Window.partitionBy("hsh")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), novel.as("n_novel"),
          round(novel.cast("double") / count(lit(1)), 6).as("novelty"))
        .orderBy("doc_id")
    },

    // GRAPH CENTRALITY over the near-dup graph: 6 fixed-point PageRank
    // rounds (damping 85/100) on the same undirected pair edges the
    // cluster resolution uses. The curation read: a document whose
    // near-dup neighbourhood is large AND well-connected (template/
    // boilerplate hubs) ranks high — a better dedup-priority signal than
    // raw degree because it weights neighbours by THEIR connectedness.
    // All arithmetic is scaled BIGINT (see GraphOps.pageRank), so the
    // scores are bit-identical across engines and cluster sizes — the
    // oracle is an INDEPENDENT unrolled-CTE implementation, not a port.
    Q("q_pagerank",
      s"""WITH $ngramPairsDuck,
         |${pageRankDuck(iters = 6, scale = 1000000000000L)}
         |SELECT r.node AS doc_id, d.deg, CAST(r.r AS BIGINT) AS pr_scaled
         |FROM r6 r JOIN deg d ON d.u = r.node
         |ORDER BY pr_scaled DESC, doc_id""".stripMargin) { (s, d) =>
      graft.Caches.getOrElseUpdate(
          s"pagerank:$d:${graft.Caches.fingerprint(s, d)}",
          GraphOps.pageRank(ngramPairs(s, d), "a_id", "b_id"))
        .select(col("node").as("doc_id"), col("deg"), col("pr_scaled"))
        .orderBy(desc("pr_scaled"), asc("doc_id"))
    }
  )
}
