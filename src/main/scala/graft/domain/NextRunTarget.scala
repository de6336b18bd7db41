package graft.domain

/** Next-run target dispatch (reference: analysis/derivations.py:54-219):
  * family by training type — interval family from vVO2max, tempo family
  * from LT pace − 3 s, easy/recovery from the athlete's HR zone band with
  * an avg_hr ± 5 fallback. Pure numeric core; pace strings M:SS/km.
  */
object NextRunTarget {

  val IntervalTypes: Set[String] = Set("interval", "vo2max", "speed", "repetition")
  val TempoTypes: Set[String] = Set("tempo", "threshold")

  def formatPaceKm(paceS: Double): String = {
    val total = math.round(paceS)
    f"${total / 60}%d:${total % 60}%02d/km"
  }

  sealed trait Target { def recommendedType: String }
  final case class IntervalTarget(vvo2maxKmh: Double, paceFast: String,
      paceSlow: String) extends Target { val recommendedType = "interval" }
  final case class TempoTarget(targetPace: String, targetHr: Option[Int])
      extends Target { val recommendedType = "tempo" }
  final case class EasyTarget(hrLow: Int, hrHigh: Int, typicalHr: Option[Int],
      referencePace: Option[String]) extends Target { val recommendedType = "easy" }
  final case class InsufficientData(recommendedType: String) extends Target

  /** vVO2max_kmh = VO2max/3.5; fast end 100 %, slow end 95 %. */
  def intervalTarget(vo2maxPrecise: Option[Double]): Target =
    vo2maxPrecise match {
      case None => InsufficientData("interval")
      case Some(v) =>
        val vvo2 = v / 3.5
        IntervalTarget(math.round(vvo2 * 10) / 10.0,
          formatPaceKm(3600 / vvo2), formatPaceKm(3600 / (vvo2 * 0.95)))
    }

  /** LT pace (1000/speed) minus 3 s. */
  def tempoTarget(ltSpeedMps: Option[Double], avgHr: Option[Int]): Target =
    ltSpeedMps.filter(_ > 0) match {
      case None => InsufficientData("tempo")
      case Some(s) => TempoTarget(formatPaceKm(1000.0 / s - 3.0), avgHr)
    }

  /** Garmin zone band for the family (recovery -> Zone1, easy/base ->
    * Zone2); avg_hr ± 5 when native zones are unavailable.
    */
  def easyTarget(trainingType: Option[String], avgHr: Option[Int],
      avgPaceSPerKm: Option[Double],
      zoneBand: Option[(Int, Int)]): Target =
    (zoneBand, avgHr) match {
      case (Some((lo, hi)), _) =>
        EasyTarget(lo, hi, avgHr, avgPaceSPerKm.map(formatPaceKm))
      case (None, Some(hr)) =>
        EasyTarget(hr - 5, hr + 5, avgHr, avgPaceSPerKm.map(formatPaceKm))
      case _ => InsufficientData("easy")
    }

  def compute(trainingType: Option[String], vo2maxPrecise: Option[Double],
      ltSpeedMps: Option[Double], avgHr: Option[Int],
      avgPaceSPerKm: Option[Double],
      zoneBand: Option[(Int, Int)] = None): Target =
    trainingType.map(_.toLowerCase) match {
      case Some(t) if IntervalTypes(t) => intervalTarget(vo2maxPrecise)
      case Some(t) if TempoTypes(t) => tempoTarget(ltSpeedMps, avgHr)
      case _ => easyTarget(trainingType, avgHr, avgPaceSPerKm, zoneBand)
    }
}
