package graft

import java.sql.{Date, Timestamp}
import graft.domain.{RaceGoal, Vdot}

/** Race goal selection + progress block (reference race.py:134-229). */
class RaceGoalSpec extends SparkSpec {
  import spark.implicits._

  private def goals(rows: (Int, String, String, String, String, Double, Int)*) =
    rows.toSeq.map { case (id, u, name, d, pri, km, tgt) =>
      (id, u, name, Date.valueOf(d), pri, "race", km, tgt, "active", "",
        Timestamp.valueOf("2026-01-01 00:00:00"),
        Timestamp.valueOf("2026-01-01 00:00:00"))
    }.toDF("goal_id", "user_id", "race_name", "race_date", "priority",
      "goal_type", "distance_km", "target_time_seconds", "status", "notes",
      "created_at", "updated_at")

  test("priority-A active wins, newest goal_id first") {
    val g = goals(
      (1, "default", "old A", "2026-10-01", "A", 42.195, 12600),
      (2, "default", "new A", "2026-11-01", "A", 21.0975, 5700),
      (3, "default", "nearest B", "2026-08-20", "B", 10.0, 2400))
    val got = RaceGoal.activeGoalFor(g, "default", "2026-08-12").get
    assert(got.raceName.contains("new A"))
    assert(got.distanceKm.contains(21.0975))
  }

  test("no A/active goal -> nearest future race_date; past goals ignored") {
    val g = goals(
      (1, "default", "done", "2026-05-01", "B", 10.0, 2400),
      (2, "default", "soon", "2026-09-01", "B", 10.0, 2400),
      (3, "default", "later", "2026-12-01", "B", 42.195, 12600))
    val got = RaceGoal.activeGoalFor(g, "default", "2026-08-12").get
    assert(got.raceName.contains("soon"))
    // user with only past goals -> none
    val past = goals((1, "u2", "done", "2026-05-01", "B", 10.0, 2400))
    assert(RaceGoal.activeGoalFor(past, "u2", "2026-08-12").isEmpty)
  }

  test("inactive priority-A does not take the preferred tier") {
    val g = goals(
      (1, "default", "A but done", "2026-10-01", "A", 42.195, 12600),
      (2, "default", "nearest", "2026-09-01", "C", 5.0, 1200))
    val amended = g.withColumn("status",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("goal_id") === 1, "completed")
        .otherwise("active"))
    val got = RaceGoal.activeGoalFor(amended, "default", "2026-08-12").get
    assert(got.raceName.contains("nearest"))
  }

  test("progress: gap, pace gap, weeks remaining, status thresholds") {
    val today = java.time.LocalDate.of(2026, 8, 12)
    val vdot = 50.0
    val predicted = Vdot.predictRaceTime(vdot, 10.0)
    // target exactly predicted -> gap 0 -> on_track
    val onTrack = RaceGoal.progress(vdot,
      RaceGoal.Goal(Some("r"), Some("2026-09-16"), Some(10.0),
        Some(predicted.toInt)), today).get
    assert(onTrack.gapSeconds === 0L && onTrack.status === "on_track")
    assert(onTrack.weeksRemaining.contains(5)) // 35 days
    // target 2 min faster than predicted -> behind
    val behind = RaceGoal.progress(vdot,
      RaceGoal.Goal(Some("r"), Some("2026-09-16"), Some(10.0),
        Some((predicted - 120).toInt)), today).get
    assert(behind.gapSeconds === 120L && behind.status === "behind")
    assert(behind.paceGapSecPerKm === 12.0)
    // target 2 min slower -> ahead
    val ahead = RaceGoal.progress(vdot,
      RaceGoal.Goal(Some("r"), Some("2026-09-16"), Some(10.0),
        Some((predicted + 120).toInt)), today).get
    assert(ahead.status === "ahead")
    // missing distance or target -> no progress block
    assert(RaceGoal.progress(vdot,
      RaceGoal.Goal(Some("r"), Some("2026-09-16"), None, Some(2400)),
      today).isEmpty)
    assert(RaceGoal.progress(vdot,
      RaceGoal.Goal(Some("r"), Some("2026-09-16"), Some(10.0), None),
      today).isEmpty)
    // race date in the past clamps weeks_remaining at 0
    val pastRace = RaceGoal.progress(vdot,
      RaceGoal.Goal(Some("r"), Some("2026-08-01"), Some(10.0),
        Some(predicted.toInt)), today).get
    assert(pastRace.weeksRemaining.contains(0))
  }
}
