package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Race goal selection + goal progress (reference
  * database/readers/race.py:134-229) — the piece VERDICT r1 flagged as
  * missing between athlete_goals and the RacePrediction blend.
  */
object RaceGoal {

  final case class Goal(raceName: Option[String], raceDate: Option[String],
      distanceKm: Option[Double], targetTimeSeconds: Option[Int])

  final case class Progress(predictedTimeSeconds: Long, gapSeconds: Long,
      paceGapSecPerKm: Double, weeksRemaining: Option[Int], status: String)

  // Status thresholds on the predicted-vs-target gap (race.py:30-34).
  val AheadThresholdS: Int = -60
  val OnTrackThresholdS: Int = 60

  /** Per-user active goal (race.py:134-175): prefer priority='A' AND
    * status='active' (newest goal_id first); otherwise the nearest future
    * race_date on/after `today`. One row per user with a goal — a window
    * rank per preference tier then a rank across tiers, so the selection
    * scales to any number of users without a driver loop.
    */
  def activeGoal(goals: DataFrame, today: String): DataFrame = {
    val preferred = goals
      .where(col("priority") === "A" && col("status") === "active")
      .withColumn("_tier", lit(0))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("user_id").orderBy(col("goal_id").desc)))
    val nearestFuture = goals
      .where(col("race_date") >= lit(today).cast("date"))
      .withColumn("_tier", lit(1))
      .withColumn("_rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("race_date").asc, col("goal_id").asc)))
    preferred.unionByName(nearestFuture)
      .where(col("_rk") === 1)
      .withColumn("_best", row_number().over(
        Window.partitionBy("user_id").orderBy(col("_tier").asc)))
      .where(col("_best") === 1)
      .select(col("user_id"), col("race_name"), col("race_date"),
        col("distance_km"), col("target_time_seconds"))
  }

  /** Single-user convenience mirroring the reference reader's return shape
    * (the goals table is tiny — one collect of at most one row).
    */
  def activeGoalFor(goals: DataFrame, userId: String,
      today: String): Option[Goal] =
    activeGoal(goals.where(col("user_id") === userId), today)
      .collect().headOption.map { r =>
        Goal(
          Option(r.getAs[String]("race_name")),
          Option(r.getAs[java.sql.Date]("race_date")).map(_.toString),
          Option(r.getAs[java.lang.Double]("distance_km")).map(_.doubleValue),
          Option(r.getAs[java.lang.Integer]("target_time_seconds"))
            .map(_.intValue))
      }

  /** Progress block (race.py:186-229): VDOT-predicted time at the goal
    * distance vs the target. None when distance is missing/zero or the
    * target is missing (the gap would be meaningless).
    */
  def progress(currentVdot: Double, goal: Goal,
      today: java.time.LocalDate): Option[Progress] =
    for {
      distanceKm <- goal.distanceKm.filter(_ != 0.0)
      target <- goal.targetTimeSeconds
    } yield {
      val predicted = Vdot.predictRaceTime(currentVdot, distanceKm)
      val gap = predicted - target
      // round half-even to 1 dp like Python round()
      val paceGap = new java.math.BigDecimal(gap / distanceKm)
        .setScale(1, java.math.RoundingMode.HALF_EVEN).doubleValue()
      val weeks = goal.raceDate.flatMap { ds =>
        try {
          val d = java.time.LocalDate.parse(ds)
          Some(math.max(
            (java.time.temporal.ChronoUnit.DAYS.between(today, d) / 7).toInt,
            0))
        } catch { case _: java.time.format.DateTimeParseException => None }
      }
      val status =
        if (gap <= AheadThresholdS) "ahead"
        else if (math.abs(gap) < OnTrackThresholdS) "on_track"
        else "behind"
      Progress(predicted, gap, paceGap, weeks, status)
    }
}
