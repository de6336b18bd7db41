package graft.domain

/** Per-activity performance derivations that walk the ordered lap list
  * (reference: inserters/performance_trends.py 19-185 and
  * rag/queries/interval_analysis.py 25-329). Laps per activity are ≤ ~40,
  * so these run inside a per-activity flatMapGroups at corpus scale —
  * the same placement as the intensity estimator (SURVEY §7.2).
  */
object Performance {

  val WorkIntensities: Set[String] = Set("ACTIVE", "INTERVAL")
  val RestIntensities: Set[String] = Set("REST", "RECOVERY")

  /** Lap for drift/interval purposes: pace s/km, hr bpm. */
  final case class Lap(intensity: Option[String], pace: Option[Double],
      hr: Option[Double])

  /** 'interval' when >= 2 work and >= 2 rest laps alternate with >= 3
    * transitions; else 'steady'. WARMUP/COOLDOWN/missing laps ignored.
    */
  def classifyWorkoutStructure(laps: Seq[Lap]): String = {
    val seq = laps.flatMap(_.intensity.map(_.toUpperCase)).collect {
      case i if WorkIntensities(i) => "work"
      case i if RestIntensities(i) => "rest"
    }
    val work = seq.count(_ == "work")
    val rest = seq.count(_ == "rest")
    if (work < 2 || rest < 2) "steady"
    else {
      val transitions = seq.zip(seq.tail).count { case (a, b) => a != b }
      if (transitions >= 3) "interval" else "steady"
    }
  }

  /** speed:HR efficiency ratio of a lap group: (1/mean pace)/mean HR. */
  private def efficiencyRatio(laps: Seq[Lap]): Option[Double] = {
    if (laps.isEmpty) None
    else {
      val meanPace = laps.flatMap(_.pace).sum / laps.size
      val meanHr = laps.flatMap(_.hr).sum / laps.size
      if (meanPace <= 0 || meanHr <= 0) None
      else Some((1.0 / meanPace) / meanHr)
    }
  }

  /** First-vs-second-half Pa:HR decoupling % over usable laps (positive =
    * efficiency lost late). None with < 2 usable laps.
    */
  def steadyDecoupling(laps: Seq[Lap]): Option[Double] = {
    val valid = laps.filter(l =>
      l.pace.exists(_ > 0) && l.hr.exists(_ > 0))
    if (valid.size < 2) None
    else {
      val mid = valid.size / 2
      for {
        first <- efficiencyRatio(valid.take(mid))
        second <- efficiencyRatio(valid.drop(mid))
        if first != 0
      } yield (first - second) / first * 100.0
    }
  }

  /** Early-vs-late rep efficiency drift over the work reps (interval
    * sessions — a plain time bisection breaks when work and rest laps
    * interleave). Same ratio math as [[steadyDecoupling]].
    */
  def repMatchedDrift(workReps: Seq[Lap]): Option[Double] = steadyDecoupling(workReps)

  /** Structure-aware hr_drift_percentage (performance_trends.py:350-360). */
  def hrDrift(laps: Seq[Lap]): Option[Double] = {
    val runLaps = laps.filter(_.intensity.exists(i => WorkIntensities(i.toUpperCase)))
    classifyWorkoutStructure(laps) match {
      case "interval" => repMatchedDrift(runLaps)
      case _ => steadyDecoupling(runLaps)
    }
  }

  // ---- interval (work/recovery) analysis (interval_analysis.py) ----

  final case class Segment(segmentType: String, startS: Double, endS: Double,
      avgHr: Option[Double], avgPace: Option[Double], avgGct: Option[Double])

  /** intensity_type -> segment label (None/unknown = steady). */
  def segmentType(intensity: Option[String]): String =
    intensity.map(_.toUpperCase) match {
      case Some("INTERVAL") => "work"
      case Some("RECOVERY") => "recovery"
      case Some("WARMUP") => "warmup"
      case Some("COOLDOWN") => "cooldown"
      case _ => "steady"
    }

  final case class Fatigue(hrIncreaseBpm: Double, paceDegradationSecPerKm: Double,
      gctDegradationMs: Double)

  /** Last-vs-first work-segment deltas; zeros with < 2 work segments. */
  def detectFatigue(segments: Seq[Segment]): Fatigue = {
    val work = segments.filter(_.segmentType == "work")
    if (work.size < 2) Fatigue(0, 0, 0)
    else {
      val (first, last) = (work.head, work.last)
      Fatigue(
        last.avgHr.getOrElse(0.0) - first.avgHr.getOrElse(0.0),
        (last.avgPace.getOrElse(0.0) - first.avgPace.getOrElse(0.0)) * 60.0,
        last.avgGct.getOrElse(0.0) - first.avgGct.getOrElse(0.0))
    }
  }

  /** HR recovery rate bpm/min for a work -> recovery pair. */
  def recoveryRate(work: Segment, recovery: Segment): Option[Double] = {
    val durationMin = (recovery.endS - recovery.startS) / 60.0
    for {
      wHr <- work.avgHr
      rHr <- recovery.avgHr
      if durationMin > 0
    } yield (wHr - rHr) / durationMin
  }
}

/** Blended race prediction (reference: analysis/race_prediction.py — curve
  * 0.6 / vdot 0.4, 3 % agreement band, extrapolated-bucket downgrade).
  */
object RacePrediction {

  val CurveWeight = 0.6
  val VdotWeight = 0.4
  val AgreementThreshold = 0.03
  val BucketMatchTolerance = 0.15

  final case class Prediction(predictedSeconds: Long, confidence: String,
      source: String)

  private val downgrade = Map("high" -> "medium", "medium" -> "low", "low" -> "low")

  /** Blend the VDOT prediction with the objective-curve prediction for a
    * target distance. `curveBuckets` = (bucketKm, predictedSeconds for the
    * target extrapolated from that bucket's pace): the nearest bucket is
    * used; beyond 15 % relative distance it counts as extrapolated and
    * downgrades confidence.
    */
  def predict(vdotSeconds: Option[Long], curveBuckets: Seq[(Double, Long)],
      distanceKm: Double): Option[Prediction] = {
    val curve = curveBuckets
      .sortBy { case (km, _) => math.abs(km - distanceKm) }
      .headOption
      .map { case (km, secs) =>
        (secs, math.abs(km - distanceKm) / distanceKm > BucketMatchTolerance)
      }
    (vdotSeconds, curve) match {
      case (Some(v), Some((c, extrapolated))) =>
        val blended = math.round(CurveWeight * c + VdotWeight * v)
        val divergence = math.abs(c.toDouble - v.toDouble) / v.toDouble
        val base = if (divergence < AgreementThreshold) "high" else "medium"
        val conf = if (extrapolated) downgrade(base) else base
        Some(Prediction(blended, conf, "blended"))
      case (Some(v), None) => Some(Prediction(v, "low", "vdot"))
      case (None, Some((c, _))) => Some(Prediction(c, "low", "curve"))
      case _ => None
    }
  }
}
