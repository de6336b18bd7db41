package graft.domain

/** Jack Daniels VDOT model (reference: pkg/fitness/vdot.py:20-170).
  *
  * Pure math — usable from driver code and registrable as deterministic
  * scalar UDFs; the binary search keeps the reference's exact integer
  * midpoint semantics so predictions match second-for-second.
  */
object Vdot {

  /** Oxygen cost (ml/kg/min) at velocity in m/min. */
  def oxygenCost(vMPerMin: Double): Double =
    -4.60 + 0.182258 * vMPerMin + 0.000104 * vMPerMin * vMPerMin

  /** Sustainable fraction of VO2max for a duration in minutes. */
  def percentVo2max(timeMinutes: Double): Double =
    0.8 + 0.1894393 * math.exp(-0.012778 * timeMinutes) +
      0.2989558 * math.exp(-0.1932605 * timeMinutes)

  def vdotFromRace(distanceKm: Double, timeSeconds: Long): Double = {
    val timeMin = timeSeconds / 60.0
    val velocity = distanceKm * 1000.0 / timeMin
    oxygenCost(velocity) / percentVo2max(timeMin)
  }

  /** Garmin VO2max ≈ VDOT with a small empirical scale-down. */
  def vdotFromVo2max(vo2max: Double): Double = vo2max * 0.98

  /** Velocity (m/min) sustaining a given %VO2max of a VDOT — the oxygen-cost
    * quadratic inverted (positive root, clamped at 1 m/min).
    */
  def velocityForPct(vdot: Double, pctVo2max: Double): Double = {
    val target = pctVo2max * vdot
    val a = 0.000104
    val b = 0.182258
    val c = -4.60 - target
    val disc = math.max(b * b - 4 * a * c, 0.0)
    math.max((-b + math.sqrt(disc)) / (2 * a), 1.0)
  }

  private def paceSecPerKm(vMPerMin: Double): Double = 1000.0 / vMPerMin * 60.0

  final case class PaceZones(easyLow: Double, easyHigh: Double, marathon: Double,
      threshold: Double, interval: Double, repetition: Double)

  /** Daniels training paces (sec/km, rounded to 0.1) at the reference's
    * intensity percentages (59/74/80/88/98/105 %VO2max).
    */
  def paceZones(vdot: Double): PaceZones = {
    def pace(pct: Double): Double =
      math.round(paceSecPerKm(velocityForPct(vdot, pct)) * 10.0) / 10.0
    PaceZones(pace(0.59), pace(0.74), pace(0.80), pace(0.88), pace(0.98), pace(1.05))
  }

  /** Race-time prediction: binary search over seconds (integer midpoints,
    * 100 iterations, 0.01 VDOT tolerance — reference semantics).
    */
  def predictRaceTime(vdot: Double, distanceKm: Double): Long = {
    var low = 1L
    var high = 86400L
    var i = 0
    while (i < 100) {
      val mid = (low + high) / 2
      val est = vdotFromRace(distanceKm, mid)
      if (math.abs(est - vdot) < 0.01) return mid
      else if (est > vdot) low = mid
      else high = mid
      i += 1
    }
    (low + high) / 2
  }
}
