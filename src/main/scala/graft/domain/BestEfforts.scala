package graft.domain

/** Best-effort segment extraction (reference:
  * pkg/objective_fitness/segments.py:53-119): for each distance bucket, the
  * fastest minimal contiguous split window covering the bucket.
  *
  * Runs per-activity over the collected split list (n ≈ 9–40 — the one
  * place a row-by-row scan is the right tool; SURVEY.md §7.2). Distributed
  * use: groupBy(activity_id).flatMapGroups over sorted splits.
  */
object BestEfforts {

  final case class Split(splitIndex: Int, distanceM: Double, durationS: Double)
  final case class BestEffort(targetKm: Double, actualKm: Double,
      durationS: Double, paceSecPerKm: Double, vdot: Double)

  /** Fastest minimal window with summed distance >= target; None if the
    * activity is too short. Minimal = grown from each start only until the
    * target is first reached.
    */
  def bestContiguousSegment(splits: Seq[Split], targetKm: Double): Option[BestEffort] = {
    val ordered = splits.sortBy(_.splitIndex)
    val targetM = targetKm * 1000.0
    var best: Option[BestEffort] = None
    for (start <- ordered.indices) {
      var dist = 0.0
      var dur = 0.0
      var end = start
      var done = false
      while (end < ordered.length && !done) {
        dist += ordered(end).distanceM
        dur += ordered(end).durationS
        if (dist >= targetM) {
          val actualKm = dist / 1000.0
          val pace = dur / actualKm
          if (best.forall(pace < _.paceSecPerKm))
            best = Some(BestEffort(targetKm, actualKm, dur, pace,
              Vdot.vdotFromRace(actualKm, math.round(dur))))
          done = true
        }
        end += 1
      }
    }
    best
  }

  def runBestEfforts(splits: Seq[Split],
      bucketsKm: Seq[Double] = Seq(2.0, 5.0, 10.0)): Seq[BestEffort] =
    bucketsKm.flatMap(bestContiguousSegment(splits, _))
}
