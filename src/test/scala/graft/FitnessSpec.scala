package graft

import java.sql.Date
import graft.domain.{FitnessAssessor, NextRunTarget}

class FitnessSpec extends SparkSpec {

  test("next-run target dispatch: interval / tempo / easy / fallbacks") {
    import NextRunTarget._
    val i = compute(Some("interval"), Some(52.5), None, None, None)
      .asInstanceOf[IntervalTarget]
    assert(i.vvo2maxKmh === 15.0) // 52.5/3.5
    assert(i.paceFast === "4:00/km") // 3600/15
    assert(i.paceSlow === formatPaceKm(3600 / (15.0 * 0.95)))
    val t = compute(Some("tempo"), None, Some(4.0), Some(168), None)
      .asInstanceOf[TempoTarget]
    assert(t.targetPace === "4:07/km") // 250 - 3 = 247s
    // easy with native zone band wins over avg_hr fallback
    val e = compute(Some("easy"), None, None, Some(145), Some(340.0), Some((117, 137)))
      .asInstanceOf[EasyTarget]
    assert(e.hrLow === 117 && e.hrHigh === 137 && e.typicalHr.contains(145))
    // fallback band avg_hr ± 5
    val f = compute(Some("easy"), None, None, Some(145), None, None)
      .asInstanceOf[EasyTarget]
    assert(f.hrLow === 140 && f.hrHigh === 150)
    assert(compute(Some("interval"), None, None, None, None)
      .isInstanceOf[InsufficientData])
  }

  test("fitness assessor: volume, run rate, gap + pre-gap baseline, type mix") {
    import spark.implicits._
    // 24 weeks of steady 3x/week 10k running, then a 16-day gap, then 4 runs
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Date, Double, String)]
    val gapEndDay = 200
    for (d <- 10 until 178 by 3)
      runs += ((Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(d)),
        10.0, "aerobic_base"))
    // gap: day 175 -> 191 (16 days), then resume
    for (d <- 191 to gapEndDay by 3)
      runs += ((Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(d)),
        8.0, "tempo"))
    val df = runs.toSeq.toDF("activity_date", "total_distance_km", "training_type")
    val asOf = Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(gapEndDay))
    val a = FitnessAssessor.assess(spark, df, asOf)
    assert(a.latestGapDays.contains(16)) // last steady run day 175 -> resume day 191
    // pre-gap 24-week weekly median: ~2-3 runs x 10km per ISO week
    assert(a.preGapWeeklyMedianKm.exists(m => m >= 20.0 && m <= 30.0))
    // 8-week window spans the gap: only the 4 post-gap runs + tail of steady block
    assert(a.eightWeekKm > 0)
    assert(a.trainingTypeDistribution.keySet.contains("tempo"))
    assert(math.abs(a.trainingTypeDistribution.values.sum - 1.0) < 1e-9)
  }

  test("current + pre-gap VDOT: vo2max path, race fallback, rounding") {
    import spark.implicits._
    import graft.domain.Vdot
    val asOf = Date.valueOf("2026-07-20")
    val acts = Seq(
      (Date.valueOf("2026-03-01"), 10.0, "aerobic_base", Some(3000.0)),
      (Date.valueOf("2026-06-20"), 10.0, "aerobic_base", Some(2940.0)), // 294 s/km
      (Date.valueOf("2026-07-10"), 5.0, "tempo", Some(1400.0)), // fastest pace 280
      (Date.valueOf("2026-07-12"), 2.0, "speed", Some(500.0))) // <3km, excluded
      .toDF("activity_date", "total_distance_km", "training_type",
        "total_time_seconds")
    // vo2max present: latest value in window wins (54.0 on 7/10)
    val vo2 = Seq(
      (Date.valueOf("2026-06-25"), 52.0),
      (Date.valueOf("2026-07-10"), 54.0))
      .toDF("activity_date", "precise_value")
    def r1(v: Double): Double = BigDecimal(v)
      .setScale(1, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    val withVo2 = FitnessAssessor.assess(spark, acts, asOf, vo2max = Some(vo2))
    // API surface returns round(vdot, 1) on BOTH paths (ADVICE r3)
    assert(withVo2.currentVdot.contains(r1(Vdot.vdotFromVo2max(54.0))))
    // no vo2max frame: fastest >=3km performance (5 km in 1400 s)
    val fallback = FitnessAssessor.assess(spark, acts, asOf)
    assert(fallback.currentVdot.contains(r1(Vdot.vdotFromRace(5.0, 1400L))))
    // a zero-time row is EXCLUDED (reference truthy check), not sorted
    // first into vdot = Infinity
    val withZero = acts.union(Seq(
      (Date.valueOf("2026-07-15"), 8.0, "tempo", Some(0.0)))
      .toDF("activity_date", "total_distance_km", "training_type",
        "total_time_seconds"))
    val z = FitnessAssessor.assess(spark, withZero, asOf)
    assert(z.currentVdot.contains(r1(Vdot.vdotFromRace(5.0, 1400L))))
    // stored avg_pace wins over computed time/distance when present:
    // the 10 km row carries a (stale) faster stored pace -> it is selected
    val withPace = Seq(
      (Date.valueOf("2026-06-20"), 10.0, "aerobic_base", Some(2940.0), Some(270.0)),
      (Date.valueOf("2026-07-10"), 5.0, "tempo", Some(1400.0), Some(280.0)))
      .toDF("activity_date", "total_distance_km", "training_type",
        "total_time_seconds", "avg_pace_seconds_per_km")
    val p = FitnessAssessor.assess(spark, withPace, asOf)
    assert(p.currentVdot.contains(r1(Vdot.vdotFromRace(10.0, 2940L))))
    // pre-gap VDOT: gap must exist; build a gapped history with a pre-gap vo2
    val gapped = Seq(
      (Date.valueOf("2026-06-01"), 10.0, "aerobic_base", Some(3000.0)),
      (Date.valueOf("2026-06-05"), 10.0, "aerobic_base", Some(3000.0)),
      (Date.valueOf("2026-06-25"), 10.0, "tempo", Some(2900.0)))
      .toDF("activity_date", "total_distance_km", "training_type",
        "total_time_seconds")
    val vo2Pre = Seq((Date.valueOf("2026-06-03"), 50.0))
      .toDF("activity_date", "precise_value")
    val g = FitnessAssessor.assess(spark, gapped, Date.valueOf("2026-06-25"),
      vo2max = Some(vo2Pre))
    assert(g.latestGapDays.contains(20))
    val want = BigDecimal(Vdot.vdotFromVo2max(50.0))
      .setScale(1, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    assert(g.preGapVdot.contains(want))
  }
}
