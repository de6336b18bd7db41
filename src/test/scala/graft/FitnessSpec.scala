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
}
