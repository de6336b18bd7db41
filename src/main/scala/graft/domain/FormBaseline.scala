package graft.domain

import graft.functions.Huber
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Form-baseline trainer + scorer (reference: pkg/form_baseline/trainer.py
  * 15-203, scorer.py 22-269 — gates, factors, bands and star strings
  * byte-exact).
  *
  * The monthly trainer is a batch job: DataFrame range gates -> distributed
  * Huber fit (graft.functions.Huber) -> coefficients persisted to
  * form_baseline_history; scoring is then pure column math once the
  * coefficients are joined (interval-containment join, SURVEY §2.3).
  */
object FormBaseline {

  /** Power-law GCT model: v = exp(alpha) * gct^d, d < 0 enforced. */
  final case class GctPowerModel(alpha: Double, d: Double, rmse: Double, n: Long) {
    def predict(gctMs: Double): Double = math.exp(alpha + d * math.log(gctMs))
    def predictInverse(speedMps: Double): Double =
      math.exp((math.log(speedMps) - alpha) / d)
  }

  final case class LinearModel(a: Double, b: Double, rmse: Double, n: Long) {
    def predict(speedMps: Double): Double = a + b * speedMps
  }

  /** Valid-range outlier gates (trainer.py): filtered in the DataFrame, so
    * the fit never sees out-of-range rows.
    */
  val SpeedRange: (Double, Double) = (1.5, 7.0)
  val GctRange: (Double, Double) = (100.0, 400.0)
  val Ranges: Map[String, (Double, Double)] = Map(
    "vo" -> (2.0, 15.0), "vr" -> (2.0, 20.0), "cadence" -> (140.0, 210.0))

  private def gated(df: DataFrame, c: String, range: (Double, Double)): DataFrame =
    df.where(col(c).between(range._1, range._2))

  /** Log-log Huber fit of speed ~ GCT with monotonicity d < 0 enforced and
    * a deterministic RANSAC fallback.
    */
  def fitGctPower(df: DataFrame, gctCol: String = "gct_ms",
      speedCol: String = "speed_mps"): GctPowerModel = {
    val clean = gated(gated(df, gctCol, GctRange), speedCol, SpeedRange)
      .select(log(col(gctCol)).as("lx"), log(col(speedCol)).as("ly"))
    require(clean.count() >= 3, "insufficient data after outlier removal")
    val h = Huber.fit(clean, "lx", "ly")
    val fit =
      if (h.b < 0) h
      else {
        val r = Huber.ransac(clean, "lx", "ly")
        require(r.b < 0, f"RANSAC failed to find monotonic model: d=${r.b}%.3f >= 0")
        r
      }
    GctPowerModel(fit.a, fit.b, fit.rmse, fit.n)
  }

  /** Linear Huber fit of a form metric ~ speed with the metric's gate. */
  def fitLinear(df: DataFrame, metric: String, valueCol: String,
      speedCol: String = "speed_mps"): LinearModel = {
    val range = Ranges.getOrElse(metric,
      throw new IllegalArgumentException(s"Unknown metric: $metric"))
    val clean = gated(gated(df, valueCol, range), speedCol, SpeedRange)
    require(clean.count() >= 2, "insufficient data after outlier removal")
    val fit = Huber.fit(clean, speedCol, valueCol)
    LinearModel(fit.a, fit.b, fit.rmse, fit.n)
  }

  // ---- scorer (scorer.py) ----

  val ImprovementFactor: Map[String, Double] =
    Map("gct" -> 0.3, "vo" -> 0.3, "vr" -> 0.2, "cadence" -> 0.3)

  /** Asymmetric penalty: improvement direction gets the reduced factor
    * (cadence's improvement direction is positive delta), degradation the
    * full 1.0; scaled x10 and clamped to 0-100.
    */
  def penalty(metric: String, deltaPct: Double): Double = {
    val isImprovement = if (metric == "cadence") deltaPct > 0 else deltaPct < 0
    val factor = if (isImprovement) ImprovementFactor(metric) else 1.0
    math.max(0.0, math.min(100.0, math.abs(deltaPct) * factor * 10.0))
  }

  /** Balanced-improvement bonus (<=5) or divergence penalty (spread bands
    * 5/10/15 -> -2/-5/-10).
    */
  def consistencyAdjustment(gctDeltaPct: Double, voDeltaPct: Double,
      vrDeltaPct: Double): Double = {
    val deltas = Seq(gctDeltaPct, voDeltaPct, vrDeltaPct)
    val spread = deltas.max - deltas.min
    if (deltas.forall(_ <= 0)) math.min(5.0, math.abs(deltas.sum) / 3.0 * 0.5)
    else if (spread > 15.0) -10.0
    else if (spread > 10.0) -5.0
    else if (spread > 5.0) -2.0
    else 0.0
  }

  final case class Score(score: Double, gctPenalty: Double, voPenalty: Double,
      vrPenalty: Double, gctNeedsImprovement: Boolean,
      voNeedsImprovement: Boolean, vrNeedsImprovement: Boolean)

  /** Overall form score: 100 − mean(penalties) + consistency, clamped;
    * needs_improvement at penalty > 20; cadence deliberately excluded
    * (independent metric in the reference).
    */
  def score(gctDeltaPct: Double, voDeltaPct: Double, vrDeltaPct: Double): Score = {
    val (pg, pv, pr) =
      (penalty("gct", gctDeltaPct), penalty("vo", voDeltaPct), penalty("vr", vrDeltaPct))
    val overall = math.max(0.0, math.min(100.0,
      100.0 - (pg + pv + pr) / 3.0 +
        consistencyAdjustment(gctDeltaPct, voDeltaPct, vrDeltaPct)))
    Score(overall, pg, pv, pr, pg > 20.0, pv > 20.0, pr > 20.0)
  }

  final case class StarRating(stars: String, score: Double, category: String)

  /** Penalty -> star bands (<10 excellent ... >=60 poor); star strings are
    * byte-exact U+2605/U+2606 runs.
    */
  def starRating(penalty: Double): StarRating = {
    val f = "★"; val e = "☆"
    if (penalty < 10.0) StarRating(f * 5, 5.0, "excellent")
    else if (penalty < 20.0) StarRating(f * 4 + e, 4.0, "good")
    else if (penalty < 40.0) StarRating(f * 3 + e * 2, 3.0, "average")
    else if (penalty < 60.0) StarRating(f * 2 + e * 3, 2.0, "below_average")
    else StarRating(f + e * 4, 1.0, "poor")
  }
}
