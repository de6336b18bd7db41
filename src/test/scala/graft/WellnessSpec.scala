package graft

import graft.domain.Wellness
import org.scalatest.funsuite.AnyFunSuite

class WellnessSpec extends AnyFunSuite {

  test("baseline band: direction-aware adverse, strict boundaries, pstdev") {
    val series = Seq(50.0, 52, 48, 50, 51, 49, 50).map(Option(_))
    // pstdev of the series ~1.2; today 45 -> z ~ -4 -> low; HRV low is adverse
    val hrv = Wellness.metricBaseline(series, Some(45.0), "hrv")
    assert(hrv.flag === "low" && hrv.adverse)
    // RHR: high is the bad direction
    val rhr = Wellness.metricBaseline(series, Some(56.0), "rhr", "high_is_bad")
    assert(rhr.flag === "high" && rhr.adverse)
    val rhrLow = Wellness.metricBaseline(series, Some(45.0), "rhr", "high_is_bad")
    assert(rhrLow.flag === "low" && !rhrLow.adverse)
    // exactly ±1 SD is within (strict boundary)
    val flat = Seq.fill(8)(Option(10.0)) :+ Option(14.0) // mean/std known
    val mb = Wellness.metricBaseline(Seq(Some(8.0), Some(12.0), Some(8.0),
      Some(12.0), Some(8.0), Some(12.0), Some(8.0), Some(12.0)), Some(12.0), "hrv")
    assert(mb.z.contains(1.0) && mb.flag === "within")
  }

  test("insufficient below 7 samples or missing today") {
    val few = Seq.fill(6)(Option(50.0))
    assert(Wellness.metricBaseline(few, Some(50.0), "hrv").flag === "insufficient")
    assert(!Wellness.metricBaseline(few, Some(40.0), "hrv").adverse)
    assert(Wellness.metricBaseline(Seq.fill(10)(Option(50.0)), None, "hrv")
      .flag === "insufficient")
  }

  test("zero-spread band degenerates to within") {
    val flat = Seq.fill(10)(Option(50.0))
    val mb = Wellness.metricBaseline(flat, Some(55.0), "hrv")
    assert(mb.z.contains(0.0) && mb.flag === "within")
  }

  test("weighted star rating: clamped mean, key mismatch rejected") {
    val scores = Map("pace" -> 4.0, "form" -> 3.0, "hr" -> 5.0, "env" -> 4.0)
    val weights = Map("pace" -> 0.4, "form" -> 0.3, "hr" -> 0.2, "env" -> 0.1)
    val raw = Wellness.weightedStarRatingRaw(scores, weights)
    assert(math.abs(raw - (4.0 * 0.4 + 3.0 * 0.3 + 5.0 * 0.2 + 4.0 * 0.1)) < 1e-12)
    assert(Wellness.weightedStarRating(scores, weights) === 3.9)
    intercept[IllegalArgumentException] {
      Wellness.weightedStarRatingRaw(scores, weights - "env")
    }
    intercept[IllegalArgumentException] {
      Wellness.weightedStarRatingRaw(scores, weights.map { case (k, _) => k -> 0.0 })
    }
  }
}
