package graft

import graft.domain.FormAnomaly
import org.apache.spark.sql.functions._

/** Full detection chain on a constructed 600 s activity with four planted
  * anomaly groups (one per cause class), one improvement-direction dip that
  * must NOT flag, and contaminated-baseline spike shapes sized so the
  * z-gate, magnitude gates, sustained filter and material threshold all
  * bind exactly as designed.
  */
class FormAnomalySpec extends SparkSpec {

  // spikes at t, t+2, t+4: span 5 (>=5 sustained), gaps 2 (<= tolerance)
  private val gctSpikes = Map(300 -> 150.0, 302 -> 100.0, 304 -> 100.0) // elevation
  private val gctDips = Set(330, 332, 334) // improvement direction: no flag
  private val gctIso = Set(560, 562, 564) // flat context: isolated
  private val voSpikes = Set(450, 452, 454) // pace
  private val vrSpikes = Set(520, 522, 524) // fatigue

  private lazy val ts = {
    import spark.implicits._
    (0 until 600).map { t =>
      val noise = if (t % 2 == 0) 1.0 else -1.0
      val gct = 250.0 + noise +
        gctSpikes.getOrElse(t, 0.0) +
        (if (gctDips(t)) -100.0 else 0.0) +
        (if (gctIso(t)) 100.0 else 0.0)
      val vo = 8.0 + 0.1 * noise + (if (voSpikes(t)) 4.0 else 0.0)
      val vr = (if (t < 300) 7.0 else 7.5) + 0.05 * noise +
        (if (vrSpikes(t)) 2.5 else 0.0)
      val elevation = // climb between 295 and 310, flat elsewhere
        if (t < 295) 0.0 else if (t <= 310) (t - 295) * 1.2 else 18.0
      val pace = if (t >= 445 && t <= 455) 5.4 else 5.0
      val hr = if (t < 300) 150.0 else 170.0
      (1L, t, gct, vo, vr, elevation, pace, hr)
    }.toDF("activity_id", "ts", "gct", "vo", "vr", "elevation", "pace", "heart_rate")
  }

  private lazy val anomalies = FormAnomaly.detect(ts).collect()

  test("each planted group detected with its cause; improvements and noise silent") {
    val byMetric = anomalies.groupBy(_.getAs[String]("metric"))
      .map { case (m, rows) =>
        m -> rows.map(r => (r.getAs[Int]("ts"), r.getAs[String]("probable_cause"))).toSet
      }
    assert(byMetric("directVerticalOscillation") ===
      voSpikes.map(t => (t, "pace_change")))
    assert(byMetric("directVerticalRatio") ===
      vrSpikes.map(t => (t, "fatigue")))
    assert(byMetric("directGroundContactTime") ===
      (gctSpikes.keySet.map(t => (t, "elevation_change")) ++
        gctIso.map(t => (t, "isolated"))))
    // improvement-direction dips and baseline noise flagged nothing else
    assert(anomalies.length === 12)
  }

  test("z-scores exceed threshold and magnitude gates bind") {
    anomalies.foreach { r =>
      assert(r.getAs[Double]("z") > FormAnomaly.ZThreshold)
    }
    // the 150-unit GCT spike is the highest-z point
    val top = anomalies.maxBy(_.getAs[Double]("z"))
    assert(top.getAs[Int]("ts") === 300)
    assert(top.getAs[Double]("z") > FormAnomaly.HighSeverityZ)
  }

  test("material events: cause-identified z>3.5 seconds collapse into 3 events") {
    val events = FormAnomaly.materialEvents(FormAnomaly.detect(ts))
      .orderBy("start_ts").collect()
    // isolated group (560-564) is excluded by the material definition; the
    // 302/304 spikes sit in (3, 3.5] — anomalous but sub-material — so the
    // first event is the lone 150-unit second (single-second events are
    // legal, matching the reference's dedup-then-span semantics)
    assert(events.length === 3)
    assert(events.map(r => (r.getAs[Int]("start_ts"), r.getAs[Int]("end_ts"))).toSeq
      === Seq((300, 300), (450, 454), (520, 524)))
    assert(events.map(_.getAs[Boolean]("high_severity")).toSeq
      === Seq(true, false, false))
  }

  test("caution flag: >=3 events and >=2x baseline-scaled rate") {
    assert(FormAnomaly.cautionFlag(3, 1.0, 1.0)) // 3 >= 2*1.0*1.0
    assert(!FormAnomaly.cautionFlag(2, 1.0, 0.5)) // below 3-event floor
    assert(!FormAnomaly.cautionFlag(4, 2.0, 1.5)) // 4 < 2*1.5*2
    assert(FormAnomaly.cautionFlag(6, 2.0, 1.5)) // 6 >= 6
  }
}
