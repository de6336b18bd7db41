package graft

import graft.domain.{Performance, RacePrediction, TrendFragility}
import org.scalatest.funsuite.AnyFunSuite

/** Structure-aware drift, interval analysis, race blending and LOO
  * fragility — pure per-activity/driver math (SURVEY §2.9-2.10).
  */
class PerformanceSpec extends AnyFunSuite {
  import Performance._

  private def lap(i: String, pace: Double, hr: Double) =
    Lap(Some(i), Some(pace), Some(hr))

  test("workout structure: alternation with >=3 transitions = interval") {
    val interval = Seq(lap("WARMUP", 400, 130),
      lap("INTERVAL", 300, 165), lap("RECOVERY", 500, 140),
      lap("INTERVAL", 300, 170), lap("RECOVERY", 500, 145),
      lap("COOLDOWN", 420, 130))
    assert(classifyWorkoutStructure(interval) === "interval")
    // one work block bracketed by rests: 2 transitions -> steady
    val bracketed = Seq(lap("RECOVERY", 500, 130), lap("ACTIVE", 300, 160),
      lap("ACTIVE", 300, 162), lap("RECOVERY", 500, 135))
    assert(classifyWorkoutStructure(bracketed) === "steady")
    assert(classifyWorkoutStructure(Seq(lap("ACTIVE", 300, 150))) === "steady")
  }

  test("steady decoupling: positive when HR rises at held pace") {
    // halves: pace 400/hr 140 -> pace 400/hr 150
    val laps = Seq(lap("ACTIVE", 400, 140), lap("ACTIVE", 400, 140),
      lap("ACTIVE", 400, 150), lap("ACTIVE", 400, 150))
    val d = steadyDecoupling(laps).get
    val expected = {
      val r1 = (1.0 / 400) / 140; val r2 = (1.0 / 400) / 150
      (r1 - r2) / r1 * 100
    }
    assert(math.abs(d - expected) < 1e-12 && d > 0)
    assert(steadyDecoupling(Seq(lap("ACTIVE", 400, 140))).isEmpty)
  }

  test("hr drift dispatches on structure and uses only work laps") {
    val intervalSession = Seq(
      lap("WARMUP", 420, 120), // excluded from ratio math
      lap("INTERVAL", 300, 160), lap("RECOVERY", 600, 130),
      lap("INTERVAL", 300, 170), lap("RECOVERY", 600, 135),
      lap("COOLDOWN", 420, 125))
    val d = hrDrift(intervalSession).get
    // rep-matched over the two INTERVAL reps only: hr 160 -> 170 at pace 300
    val expected = {
      val r1 = (1.0 / 300) / 160; val r2 = (1.0 / 300) / 170
      (r1 - r2) / r1 * 100
    }
    assert(math.abs(d - expected) < 1e-12)
  }

  test("interval fatigue and recovery rate") {
    val segs = Seq(
      Segment("work", 0, 120, Some(160.0), Some(5.0), Some(240.0)),
      Segment("recovery", 120, 240, Some(130.0), Some(7.0), None),
      Segment("work", 240, 360, Some(170.0), Some(5.2), Some(252.0)))
    val f = detectFatigue(segs)
    assert(f.hrIncreaseBpm === 10.0)
    assert(math.abs(f.paceDegradationSecPerKm - 12.0) < 1e-9) // 0.2 min * 60
    assert(f.gctDegradationMs === 12.0)
    // recovery over 2 min from 160 work HR to 130: (160-130)/2 = 15 bpm/min
    assert(recoveryRate(segs(0), segs(1)).contains(15.0))
    assert(detectFatigue(segs.take(2)) === Fatigue(0, 0, 0))
  }

  test("segment type mapping incl. unknown -> steady") {
    assert(segmentType(Some("INTERVAL")) === "work")
    assert(segmentType(Some("RECOVERY")) === "recovery")
    assert(segmentType(None) === "steady")
    assert(segmentType(Some("ACTIVE")) === "steady")
  }

  test("race blend: weights, agreement bands, extrapolation downgrade") {
    // agreeing sources -> high, blended 0.6/0.4
    val p = RacePrediction.predict(Some(1200L), Seq((5.0, 1220L)), 5.0).get
    assert(p.predictedSeconds === math.round(0.6 * 1220 + 0.4 * 1200))
    assert(p.confidence === "high")
    // diverging -> medium
    assert(RacePrediction.predict(Some(1200L), Seq((5.0, 1400L)), 5.0)
      .get.confidence === "medium")
    // half-marathon served from the 10k bucket: extrapolated downgrade
    assert(RacePrediction.predict(Some(5700L), Seq((10.0, 5750L)), 21.0975)
      .get.confidence === "medium")
    // single-source -> low
    assert(RacePrediction.predict(Some(1200L), Seq.empty, 5.0).get.confidence === "low")
    assert(RacePrediction.predict(None, Seq.empty, 5.0).isEmpty)
  }

  test("linregress: 3-point gate, significance classification") {
    assert(TrendFragility.linregress(Seq((0.0, 1.0), (1.0, 2.0))).isEmpty)
    val strong = (0 until 10).map(i => (i.toDouble, 2.0 + 0.5 * i + 0.001 * (i % 2)))
    val fit = TrendFragility.linregress(strong).get
    assert(math.abs(fit.slope - 0.5) < 0.01)
    assert(fit.p < 0.001)
    assert(TrendFragility.classify(Some(fit)) === "worsening")
    assert(TrendFragility.classify(Some(fit), worseIsHigher = false) === "improving")
    // pure noise -> insignificant -> stable
    val noise = Seq((0.0, 1.0), (1.0, 5.0), (2.0, 0.5), (3.0, 4.0), (4.0, 1.5))
    assert(TrendFragility.classify(TrendFragility.linregress(noise)) === "stable")
  }

  test("LOO fragility: one outlier carrying the trend flags as fragile") {
    // marginally-significant 5-point rise (full p = 0.0396): removing most
    // single points pushes p over 0.05 -> classification flips to stable
    val pts = Seq((0.0, 10.0), (1.0, 10.5), (2.0, 11.5), (3.0, 11.2), (4.0, 13.8))
    val frag = TrendFragility.leaveOneOut(pts).get
    assert(frag.isFragile)
    assert(frag.flipIndices.nonEmpty)
    // a genuinely consistent trend is not fragile
    val solid = (0 until 12).map(i => (i.toDouble, 10.0 + i * 0.5 + 0.02 * (i % 2)))
    assert(!TrendFragility.leaveOneOut(solid).get.isFragile)
  }
}
