package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for the training-data pipeline tier.
  *
  * Training-data curation needs samples that are (a) reproducible across
  * runs and engines — so `rand()` is out — and (b) cheap at 100 TB — so a
  * global sort by a random key is out. Both come from ranking rows by a
  * FIXED integer hash of the key: the hash is data-independent, the order
  * is total (hash, then id), and any engine computes the same sample.
  */
object Sampling {

  /** Knuth-style multiplicative hash of an integer id — exact int64
    * arithmetic in both dialects for ANY int64 id: the id is reduced
    * mod P BEFORE the multiply (algebraically identical mod P), so the
    * product is bounded by (P-1)·2654435761 < 2^62 and can never hit
    * engine-divergent overflow semantics (Spark wraps, DuckDB widens)
    * at corpus-scale ids. Uniform enough for sampling.
    */
  private val HashP = 1000000007L
  private def sampleHash(idCol: String): String =
    s"(($idCol % $HashP) * 2654435761) % $HashP"

  /** Per-stratum sample quota. */
  val StratumK = 20

  /** Global quota for the weighted (A-ES) sample. */
  val WeightedK = 50

  /** Candidate-filter safety margin: a stratum keeps rows whose hash
    * falls in the smallest `margin * k / n` fraction of hash space before
    * the exact top-k window runs. 4× the quota makes a short stratum
    * astronomically unlikely — and even then both engines compute the
    * identical (short) result, so correctness never depends on the bound.
    */
  val Margin = 4

  /** Target mixture for [[entries q_sample_mixture]]: fractions over the
    * `source` domains summing to 1 (an LLM data recipe's domain weights).
    */
  val MixtureWeights: Seq[(String, Double)] =
    Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  val entries: Seq[Q] = Seq(

    // MIXTURE REBALANCING: realize target domain weights over the corpus —
    // the "data recipe" step between curation and training. The largest
    // total T with T·w_s <= n_s for every domain (so no domain runs dry)
    // is floor(min n_s/w_s); each domain then contributes its
    // floor(T·w_s) lowest-hash documents, reusing the deterministic
    // id-hash ranking. Domains outside the recipe contribute nothing.
    // Shape: per-domain counts (tiny agg) → quota per domain broadcast →
    // the same hash-rank window as q_sample_stratified. Exactness across
    // engines: n_s/w_s and T·w_s are IEEE-exact deterministic ops, floor
    // of them likewise; everything else is integer.
    Q("q_sample_mixture", {
      val wCase = "CASE source " + MixtureWeights
        .map { case (k, w) => s"WHEN '$k' THEN $w" }.mkString(" ") + " END"
      val h = sampleHash("d.doc_id")
      s"""WITH counts AS (
         |  SELECT source, count(*) AS n, $wCase AS w FROM documents d
         |  WHERE $wCase IS NOT NULL GROUP BY source),
         |t AS (SELECT CAST(floor(min(n / w)) AS BIGINT) AS total FROM counts),
         |quota AS (
         |  SELECT source, CAST(floor(t.total * w) AS BIGINT) AS k
         |  FROM counts, t),
         |r AS (
         |  SELECT d.doc_id, d.source, q.k, $h AS h,
         |    row_number() OVER (PARTITION BY d.source
         |      ORDER BY $h, d.doc_id) AS rnk
         |  FROM documents d JOIN quota q ON d.source = q.source)
         |SELECT source, rnk, doc_id FROM r WHERE rnk <= k
         |ORDER BY source, rnk""".stripMargin
    }) { (s, d) =>
      val wCol = MixtureWeights.foldLeft(lit(null).cast("double")) {
        case (acc, (k, w)) => when(col("source") === k, lit(w)).otherwise(acc)
      }
      val docs = Tables.documents(s, d).select("doc_id", "source")
      val counts = docs.withColumn("w", wCol).where(col("w").isNotNull)
        .groupBy("source", "w").agg(count(lit(1)).as("n"))
      val total = counts.agg(
        expr("cast(floor(min(n / w)) AS bigint)").as("total"))
      val quota = counts.crossJoin(broadcast(total))
        .select(col("source"),
          expr("cast(floor(total * w) AS bigint)").as("k"))
      val w = Window.partitionBy("source")
        .orderBy(col("h").asc, col("doc_id").asc)
      docs.join(broadcast(quota), Seq("source"))
        .withColumn("h", expr(sampleHash("doc_id")))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= col("k"))
        .select("source", "rnk", "doc_id")
        .orderBy("source", "rnk")
    },

    // TEMPERATURE-FLATTENED MIXTURE REPORT: derive the domain weights
    // from the corpus itself, w_s = n_s^α / Σ n_t^α with α = 0.5 — the
    // multilingual/multi-source up-sampling recipe (α < 1 lifts
    // low-resource sources toward parity; α = 1 is proportional, α = 0
    // uniform). Emits per source: raw share, flattened weight, the
    // up/down-sampling factor w_s/share_s, and the replacement-free quota
    // floor(T·w_s) at the largest total T no source exhausts. Float
    // discipline: α = 0.5 is computed as sqrt (correctly-rounded IEEE op,
    // bit-exact in both engines — pow(x, 0.5) is NOT), and the cross-
    // source Σ√n folds over a source-ordered list, never an unordered
    // SUM. Scale shape: everything after the per-source count (one
    // shuffle) is math on |sources| rows.
    Q("q_mixture_temperature", {
      s"""WITH counts AS (
         |  SELECT source, count(*) AS n FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |    list_sum(list(sqrt(n::DOUBLE) ORDER BY source)) AS ssum
         |  FROM counts),
         |w AS (SELECT c.source, c.n, t.nn,
         |    sqrt(c.n::DOUBLE) / t.ssum AS w_temp
         |  FROM counts c, tot t),
         |tt AS (SELECT CAST(floor(min(n / w_temp)) AS BIGINT) AS total FROM w)
         |SELECT w.source, w.n,
         |  w.n::DOUBLE / w.nn AS share_raw, w.w_temp,
         |  w.w_temp / (w.n::DOUBLE / w.nn) AS boost,
         |  CAST(floor(tt.total * w.w_temp) AS BIGINT) AS quota
         |FROM w, tt ORDER BY w.source""".stripMargin
    }) { (s, d) =>
      val counts = Tables.documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum("n").as("nn"),
        sort_array(collect_list(struct(col("source"),
          sqrt(col("n").cast("double")).as("sq")))).as("sqs"))
        .select(col("nn"),
          expr("aggregate(sqs, cast(0 AS double), (a, x) -> a + x.sq)")
            .as("ssum"))
      val w = counts.crossJoin(broadcast(tot))
        .withColumn("w_temp", sqrt(col("n").cast("double")) / col("ssum"))
      val t = w.agg(expr("cast(floor(min(n / w_temp)) AS bigint)").as("total"))
      w.crossJoin(broadcast(t))
        .select(col("source"), col("n"),
          (col("n").cast("double") / col("nn")).as("share_raw"),
          col("w_temp"),
          (col("w_temp") / (col("n").cast("double") / col("nn"))).as("boost"),
          expr("cast(floor(total * w_temp) AS bigint)").as("quota"))
        .orderBy("source")
    },

    // WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis A-ES):
    // each document draws key = u^(1/w) with u uniform in (0,1) and
    // weight w; the top-k keys ARE a weighted sample without replacement.
    // Here w = n_chars — the token-budget-aware shape ("sample documents
    // proportionally to their length") an LLM data recipe needs. The
    // uniform is the deterministic id-hash scaled into (0,1], so any
    // engine draws the same sample; the rank key is the monotone
    // transform ln(u)/w (avoids u^(1/w) underflow at corpus-scale
    // weights), ROUNDED before the cut (the repo's established
    // engine-stable-ordering discipline — ln may differ in the last ulp
    // across libm implementations) with doc_id as the total tiebreak.
    // Scale shape: one map-side key computation + a global top-k
    // (TakeOrdered — never a full sort); no shuffle of the corpus.
    Q("q_sample_weighted", {
      val h = sampleHash("doc_id")
      s"""WITH k AS (
         |  SELECT doc_id, n_chars,
         |    round(ln((($h) + 1.0) / ${HashP + 1}.0) / n_chars, 9) AS key
         |  FROM documents WHERE n_chars > 0),
         |r AS (SELECT doc_id, n_chars, key,
         |    row_number() OVER (ORDER BY key DESC, doc_id) AS rnk
         |  FROM k)
         |SELECT rnk, doc_id, n_chars, round(key, 6) AS key
         |FROM r WHERE rnk <= $WeightedK ORDER BY rnk""".stripMargin
    }) { (s, d) =>
      Tables.documents(s, d).select("doc_id", "n_chars")
        .where(col("n_chars") > 0)
        .withColumn("key", round(
          log((expr(sampleHash("doc_id")) + lit(1.0)) / lit((HashP + 1).toDouble))
            / col("n_chars"), 9))
        .orderBy(col("key").desc, col("doc_id").asc)
        .limit(WeightedK)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("key").desc, col("doc_id").asc)))
        .select(col("rnk"), col("doc_id"), col("n_chars"),
          round(col("key"), 6).as("key"))
        .orderBy("rnk")
    },

    // Deterministic stratified sample: exactly k docs per language,
    // chosen by smallest id-hash. The scale shape is two-phase: per-stratum
    // counts (one tiny aggregate) set a hash THRESHOLD that filters
    // candidates map-side — the row_number window then ranks ~margin*k
    // rows per stratum instead of the whole stratum. At 100 TB the window
    // input is bounded by margin*k*|strata| rows regardless of corpus
    // size; the naive single-phase form would shuffle the full corpus
    // into per-stratum sorts.
    Q("q_sample_stratified", {
      val h = sampleHash("d.doc_id")
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |thr AS (
         |  SELECT lang,
         |    CASE WHEN n <= ${Margin * StratumK} THEN $HashP
         |         ELSE CAST(ceil($HashP * ${Margin * StratumK}.0 / n) AS BIGINT)
         |    END AS thr
         |  FROM counts),
         |cand AS (
         |  SELECT d.doc_id, d.lang, $h AS h
         |  FROM documents d JOIN thr t ON d.lang = t.lang
         |  WHERE $h < t.thr),
         |r AS (
         |  SELECT doc_id, lang, h,
         |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk
         |  FROM cand)
         |SELECT lang, rnk, doc_id FROM r WHERE rnk <= $StratumK
         |ORDER BY lang, rnk""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "lang")
      val thr = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .select(col("lang"),
          when(col("n") <= Margin * StratumK, lit(HashP))
            .otherwise(expr(
              s"cast(ceil($HashP * ${Margin * StratumK}.0 / n) AS bigint)"))
            .as("thr"))
      val cand = docs.alias("d")
        .join(broadcast(thr).alias("t"), Seq("lang"))
        .withColumn("h", expr(sampleHash("d.doc_id")))
        .where(col("h") < col("thr"))
      val w = Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)
      cand.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= StratumK)
        .select("lang", "rnk", "doc_id")
        .orderBy("lang", "rnk")
    }
  )
}
