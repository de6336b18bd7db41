package graft.domain

/** Trend regression with significance + leave-one-out fragility
  * (reference: rag/queries/trends.py:103-159 classification rules;
  * readers/durability.py:473-557 LOO sweep).
  *
  * Driver-side by design: every call site in the reference fits <= ~50
  * aggregated points (per-run daily metrics), and LOO is n refits of an
  * n-point model — re-collecting a tiny aggregate is the scale-correct
  * plan (the heavy reduction to those points is distributed; see
  * operators.Stats for the DataFrame-side regr_* path).
  */
object TrendFragility {

  final case class LinFit(slope: Double, intercept: Double, r: Double,
      p: Double, n: Int)

  /** Least-squares fit with two-sided slope p-value. Returns None below the
    * 3-point gate (the reference documents the 2-point p=NaN hazard).
    */
  def linregress(pts: Seq[(Double, Double)]): Option[LinFit] = {
    val n = pts.size
    if (n < 3) None
    else {
      val (xs, ys) = pts.unzip
      val mx = xs.sum / n
      val my = ys.sum / n
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val syy = ys.map(y => (y - my) * (y - my)).sum
      val sxy = pts.map { case (x, y) => (x - mx) * (y - my) }.sum
      if (sxx == 0) None
      else {
        val slope = sxy / sxx
        val intercept = my - slope * mx
        val r = if (syy == 0) 0.0 else sxy / math.sqrt(sxx * syy)
        val p =
          if (r * r >= 1.0) 0.0
          else {
            val t = r * math.sqrt((n - 2) / (1.0 - r * r))
            val dist = new org.apache.commons.math3.distribution.TDistribution(n - 2.0)
            2.0 * (1.0 - dist.cumulativeProbability(math.abs(t)))
          }
        Some(LinFit(slope, intercept, r, p, n))
      }
    }
  }

  /** Direction classification: insignificant (p > 0.05) -> stable, else the
    * slope's sign. `worseIsHigher` flips which sign reads as worsening.
    */
  def classify(fit: Option[LinFit], worseIsHigher: Boolean = true): String =
    fit match {
      case None => "insufficient_data"
      case Some(f) =>
        if (f.p > 0.05) "stable"
        else if ((f.slope > 0) == worseIsHigher) "worsening"
        else "improving"
    }

  final case class Fragility(isFragile: Boolean, flipIndices: Seq[Int],
      maxSlopeDelta: Double, leverageIndex: Int)

  /** Leave-one-out sweep: refit with each point dropped; fragile when any
    * refit flips the classification; leverage = the point whose removal
    * moves the slope most.
    */
  def leaveOneOut(pts: Seq[(Double, Double)],
      worseIsHigher: Boolean = true): Option[Fragility] = {
    linregress(pts).map { full =>
      val baseClass = classify(Some(full), worseIsHigher)
      val refits = pts.indices.map { i =>
        val without = pts.patch(i, Nil, 1)
        (i, linregress(without))
      }
      val flips = refits.collect {
        case (i, fit) if classify(fit, worseIsHigher) != baseClass => i
      }
      val deltas = refits.collect {
        case (i, Some(f)) => (i, math.abs(f.slope - full.slope))
      }
      val leverage = if (deltas.isEmpty) -1 else deltas.maxBy(_._2)._1
      Fragility(flips.nonEmpty, flips,
        if (deltas.isEmpty) 0.0 else deltas.map(_._2).max, leverage)
    }
  }
}
