package graft.domain

/** Injury-risk fusion (reference: pkg/analysis/injury_risk.py:33-239):
  * four 0–1 risk factors combined under fixed relative weights, renormalized
  * over whichever factors are available, scored 0–100 and banded.
  */
object InjuryRisk {

  val Weights: Map[String, Double] = Map(
    "acwr" -> 0.40, "durability" -> 0.25, "wellness" -> 0.20, "form_anomaly" -> 0.15)

  /** ACWR ratio -> risk fraction: <=1.3 safe, 1.5 half, >=1.8 saturated. */
  def acwrRisk(ratio: Double): Double =
    if (ratio <= 1.3) 0.0
    else if (ratio >= 1.8) 1.0
    else if (ratio <= 1.5) (ratio - 1.3) / 0.2 * 0.5
    else 0.5 + (ratio - 1.5) / 0.3 * 0.5

  /** Form-anomaly recent:baseline event-rate ratio -> risk: <=1.2 safe,
    * >=2.0 saturated; baselines under 0.2 events/h are unusable (None).
    */
  def formAnomalyRisk(ratio: Double, baselineRatePerHour: Double): Option[Double] =
    if (baselineRatePerHour < 0.2) None
    else if (ratio <= 1.2) Some(0.0)
    else if (ratio >= 2.0) Some(1.0)
    else Some((ratio - 1.2) / 0.8)

  /** Durability trend direction -> risk (worsening = full risk). */
  def durabilityRisk(direction: String): Option[Double] = direction match {
    case "worsening" => Some(1.0)
    case "insufficient_data" => None
    case _ => Some(0.0)
  }

  /** Adverse wellness metrics over usable metrics (None when none usable). */
  def wellnessRisk(adverse: Int, usable: Int): Option[Double] =
    if (usable == 0) None else Some(adverse.toDouble / usable)

  final case class Assessment(score: Double, band: String, available: Seq[String])

  /** Weighted fusion over the available factors; weights renormalize so a
    * missing factor redistributes its mass instead of diluting the score.
    */
  def assess(factors: Map[String, Option[Double]]): Option[Assessment] = {
    val present = factors.collect { case (k, Some(v)) if Weights.contains(k) => k -> v }
    if (present.isEmpty) None
    else {
      val wSum = present.keys.map(Weights).sum
      val score = present.map { case (k, v) => v * Weights(k) / wSum }.sum * 100.0
      Some(Assessment(score, classifyBand(score), present.keys.toSeq.sorted))
    }
  }

  /** <30 low; 30–60 moderate (inclusive); >60 high. */
  def classifyBand(score: Double): String =
    if (score < 30) "low" else if (score <= 60) "moderate" else "high"
}
