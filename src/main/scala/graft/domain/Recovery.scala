package graft.domain

/** Recovery classification (reference: pkg/analysis/recovery.py:24-227):
  * RHR 7d-vs-30d medians, HRV consecutive-below-baseline streak, and the
  * morning go/no-go recommendation.
  */
object Recovery {

  private def median(xs: Seq[Double]): Option[Double] =
    if (xs.isEmpty) None
    else {
      val s = xs.sorted
      val n = s.length
      val m = if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      Some(math.round(m * 10.0) / 10.0)
    }

  final case class RhrTrend(median7d: Option[Double], median30d: Option[Double],
      trend: String)

  /** 7d median at least 2 bpm below 30d -> improving; at least 3 above ->
    * fatigued; otherwise (or with missing medians) stable. Windows count the
    * most recent k PRESENT readings (device-off days skipped).
    */
  def rhrTrend(dailyRhr: Seq[Option[Int]]): RhrTrend = {
    val present = dailyRhr.flatten.map(_.toDouble)
    val m7 = median(present.takeRight(7))
    val m30 = median(present.takeRight(30))
    val trend = (m7, m30) match {
      case (Some(a), Some(b)) if a - b <= -2 => "improving"
      case (Some(a), Some(b)) if a - b >= 3 => "fatigued"
      case _ => "stable"
    }
    RhrTrend(m7, m30, trend)
  }

  /** Count of most recent consecutive nights with HRV below baseline-low;
    * stops at the first in-range or missing night. >=2 -> under-recovery.
    */
  def hrvStreak(nights: Seq[(Option[Double], Option[Double])]): (Int, Boolean) = {
    val below = nights.reverseIterator
      .takeWhile { case (ms, low) => ms.exists(m => low.exists(m < _)) }
      .length
    (below, below >= 2)
  }

  /** Go/no-go: readiness/sleep <50 (or HRV under-recovery) -> easy, <30 ->
    * rest; readiness >=75 with HRV normal -> quality; else moderate;
    * device-off day (both None) -> unknown.
    */
  def classify(readiness: Option[Int], sleepScore: Option[Int],
      underRecovery: Boolean): String = {
    if (readiness.isEmpty && sleepScore.isEmpty) "unknown"
    else {
      val lowReadiness = readiness.exists(_ < 50)
      val lowSleep = sleepScore.exists(_ < 50)
      if (lowReadiness || lowSleep || underRecovery) {
        if (readiness.exists(_ < 30) || sleepScore.exists(_ < 30)) "rest" else "easy"
      } else if (readiness.exists(_ >= 75)) "quality"
      else "moderate"
    }
  }
}
