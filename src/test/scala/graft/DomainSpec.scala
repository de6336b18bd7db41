package graft

import graft.domain._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-math domain operators (SURVEY.md §2.10) — checked against values
  * computed independently from the published Daniels formulas and the
  * reference's documented rule anchors.
  */
class DomainSpec extends AnyFunSuite {

  test("VDOT from race: 5k in 20:00 lands in the documented ~49-50 band") {
    val v = Vdot.vdotFromRace(5.0, 1200)
    // velocity 250 m/min -> cost 47.46; pct at 20min ~ 0.954 -> ~49.8
    assert(math.abs(v - 49.8) < 0.2, s"got $v")
  }

  test("VDOT race prediction inverts vdotFromRace") {
    val vdot = Vdot.vdotFromRace(5.0, 1200)
    val t = Vdot.predictRaceTime(vdot, 5.0)
    assert(math.abs(t - 1200L) <= 2, s"round-trip drifted: $t")
    // longer race at same fitness is slower per the %VO2max decay
    assert(Vdot.predictRaceTime(vdot, 10.0) > 2 * 1200 * 0.98)
  }

  test("pace zones are ordered easy > marathon > threshold > interval > rep") {
    val z = Vdot.paceZones(50.0)
    assert(z.easyLow > z.easyHigh) // 59% is SLOWER pace (more sec/km) than 74%
    assert(z.easyHigh > z.marathon && z.marathon > z.threshold &&
      z.threshold > z.interval && z.interval > z.repetition)
  }

  test("ACWR piecewise anchors: 1.3->0, 1.4->0.25, 1.5->0.5, 1.65->0.75, 1.8->1") {
    assert(InjuryRisk.acwrRisk(1.3) === 0.0)
    assert(math.abs(InjuryRisk.acwrRisk(1.4) - 0.25) < 1e-12)
    assert(math.abs(InjuryRisk.acwrRisk(1.5) - 0.5) < 1e-12)
    assert(math.abs(InjuryRisk.acwrRisk(1.65) - 0.75) < 1e-12)
    assert(InjuryRisk.acwrRisk(1.8) === 1.0)
    assert(InjuryRisk.acwrRisk(2.5) === 1.0)
  }

  test("injury fusion renormalizes over available factors and bands") {
    // only ACWR available at full risk -> score 100, high
    val a = InjuryRisk.assess(Map("acwr" -> Some(1.0), "durability" -> None,
      "wellness" -> None, "form_anomaly" -> None)).get
    assert(a.score === 100.0 && a.band === "high")
    // acwr 0.5 + wellness 0.5 with weights .40/.20 -> score 50 -> moderate
    val b = InjuryRisk.assess(Map("acwr" -> Some(0.5), "wellness" -> Some(0.5))).get
    assert(math.abs(b.score - 50.0) < 1e-9 && b.band === "moderate")
    assert(InjuryRisk.assess(Map("acwr" -> None)).isEmpty)
    // band boundaries: 30 and 60 are moderate
    assert(InjuryRisk.classifyBand(30.0) === "moderate")
    assert(InjuryRisk.classifyBand(60.0) === "moderate")
    assert(InjuryRisk.classifyBand(60.01) === "high")
  }

  test("form-anomaly factor: sparse baseline unusable, anchors at 1.2/2.0") {
    assert(InjuryRisk.formAnomalyRisk(3.0, 0.1).isEmpty)
    assert(InjuryRisk.formAnomalyRisk(1.2, 1.0).contains(0.0))
    assert(InjuryRisk.formAnomalyRisk(1.6, 1.0).exists(r => math.abs(r - 0.5) < 1e-12))
    assert(InjuryRisk.formAnomalyRisk(2.0, 1.0).contains(1.0))
  }

  test("RHR trend: medians over present readings, ±2/3 bpm bands") {
    // 30d median 50, recent 7 present readings median 47 -> improving
    val improving = Seq.fill(23)(Some(50)) ++ Seq.fill(3)(None) ++ Seq.fill(7)(Some(47))
    assert(Recovery.rhrTrend(improving).trend === "improving")
    val fatigued = Seq.fill(25)(Some(50)) ++ Seq.fill(7)(Some(54))
    assert(Recovery.rhrTrend(fatigued).trend === "fatigued")
    assert(Recovery.rhrTrend(Seq.fill(10)(Some(50))).trend === "stable")
    assert(Recovery.rhrTrend(Seq.empty).trend === "stable")
  }

  test("HRV streak counts trailing below-baseline nights, gap breaks it") {
    val low = Some(40.0); val base = Some(45.0)
    assert(Recovery.hrvStreak(Seq((base, base), (low, base), (low, base))) === (2, true))
    assert(Recovery.hrvStreak(Seq((low, base), (base, base))) === (0, false))
    // missing night breaks the streak
    assert(Recovery.hrvStreak(Seq((low, base), (None, base), (low, base))) === (1, false))
  }

  test("go/no-go bands: rest/easy/moderate/quality/unknown") {
    assert(Recovery.classify(Some(25), Some(80), underRecovery = false) === "rest")
    assert(Recovery.classify(Some(45), Some(80), underRecovery = false) === "easy")
    assert(Recovery.classify(Some(80), Some(80), underRecovery = true) === "easy")
    assert(Recovery.classify(Some(60), Some(60), underRecovery = false) === "moderate")
    assert(Recovery.classify(Some(80), Some(80), underRecovery = false) === "quality")
    assert(Recovery.classify(None, None, underRecovery = false) === "unknown")
  }

  test("best efforts: fastest minimal window, short runs omit buckets") {
    import BestEfforts._
    // 6 x 1km: slow-slow-fast-fast-slow-slow (durations in sec)
    val splits = Seq(
      Split(1, 1000, 300), Split(2, 1000, 300), Split(3, 1000, 240),
      Split(4, 1000, 240), Split(5, 1000, 300), Split(6, 1000, 300))
    val b2 = bestContiguousSegment(splits, 2.0).get
    assert(b2.durationS === 480.0) // the 3-4 fast pair
    assert(b2.paceSecPerKm === 240.0)
    val b5 = bestContiguousSegment(splits, 5.0).get
    assert(b5.actualKm === 5.0)
    assert(bestContiguousSegment(splits, 10.0).isEmpty)
    assert(runBestEfforts(splits).map(_.targetKm) === Seq(2.0, 5.0))
  }
}
