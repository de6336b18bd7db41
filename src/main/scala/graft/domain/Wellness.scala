package graft.domain

/** Wellness personal-baseline deviation (reference:
  * analysis/wellness_baseline.py:27-197) and the weighted star-rating core
  * (analysis/derivations.py:222-267).
  *
  * Deliberately POPULATION stddev for the band (the anomaly rolling windows
  * use sample stddev — the reference mixes the two per-site and the oracle
  * mapping must match each site; SURVEY §4.3).
  */
object Wellness {

  val DefaultMinSamples = 7
  val DefaultSdThreshold = 1.0

  final case class MetricBaseline(metric: String, mean: Option[Double],
      std: Option[Double], today: Option[Double], z: Option[Double],
      flag: String, adverse: Boolean, n: Int)

  // Python round() is banker's (half-even) rounding — math.round (half-up)
  // diverged by one last digit at exact .X5 boundaries (ADVICE r1). The
  // exact-binary BigDecimal constructor (not valueOf) matches Python, which
  // rounds the exact double value: round(2.675, 2) == 2.67 because 2.675
  // is stored below the midpoint.
  private def roundHalfEven(v: Double, scale: Int): Double =
    new java.math.BigDecimal(v)
      .setScale(scale, java.math.RoundingMode.HALF_EVEN).doubleValue()
  private def round1(v: Double) = roundHalfEven(v, 1)
  private def round2(v: Double) = roundHalfEven(v, 2)

  /** Position today's value in the band built from the past window
    * (today excluded). direction: "low_is_bad" (HRV/readiness) or
    * "high_is_bad" (RHR). Boundaries strict: exactly ±threshold is within.
    */
  def metricBaseline(series: Seq[Option[Double]], today: Option[Double],
      metric: String, direction: String = "low_is_bad",
      minSamples: Int = DefaultMinSamples,
      sdThreshold: Double = DefaultSdThreshold): MetricBaseline = {
    val present = series.flatten
    val n = present.size
    if (n < minSamples || today.isEmpty)
      MetricBaseline(metric, None, None, today, None, "insufficient", adverse = false, n)
    else {
      val mean = present.sum / n
      val std = math.sqrt(present.map(v => (v - mean) * (v - mean)).sum / n) // pstdev
      val (z, flag) =
        if (std == 0) (0.0, "within")
        else {
          val zv = round2((today.get - mean) / std)
          val f = if (zv < -sdThreshold) "low"
            else if (zv > sdThreshold) "high"
            else "within"
          (zv, f)
        }
      val adverse =
        if (direction == "high_is_bad") flag == "high" else flag == "low"
      MetricBaseline(metric, Some(round1(mean)), Some(round1(std)), today,
        Some(z), flag, adverse, n)
    }
  }

  /** Unrounded clamped weighted mean — what the merge guard compares the
    * displayed rating against (half-up vs half-even rounding at .X5
    * boundaries must not false-fail).
    */
  def weightedStarRatingRaw(axisScores: Map[String, Double],
      weights: Map[String, Double]): Double = {
    require(axisScores.nonEmpty && weights.nonEmpty,
      "axis_scores and weights must be non-empty")
    require(axisScores.keySet == weights.keySet,
      s"weights keys must match axis_scores keys: ${axisScores.keySet} vs ${weights.keySet}")
    val totalWeight = weights.values.sum
    require(totalWeight > 0, s"weights must sum to a positive value, got $totalWeight")
    val rating = axisScores.map { case (k, v) => v * weights(k) }.sum / totalWeight
    math.min(5.0, math.max(0.0, rating))
  }

  /** Display rating: the raw mean rounded to 1 dp. */
  def weightedStarRating(axisScores: Map[String, Double],
      weights: Map[String, Double]): Double =
    round1(weightedStarRatingRaw(axisScores, weights))
}
