package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fitness assessment over the activities frame (reference:
  * fitness/fitness_assessor.py:23-260): recent 8-week volume and run rate,
  * detraining-gap detection (>= 7-day inter-run gaps) with the pre-gap
  * weekly-volume baseline, and the training-type distribution.
  *
  * All inputs reduce through windows/aggregates; only the handful of
  * scalar outputs reach the driver.
  */
object FitnessAssessor {

  // Python round() half-even, on the exact double (see Wellness.roundHalfEven)
  private def round1(v: Double): Double =
    new java.math.BigDecimal(v)
      .setScale(1, java.math.RoundingMode.HALF_EVEN).doubleValue()

  final case class Assessment(
      eightWeekKm: Double,
      runsPerWeek: Double,
      latestGapDays: Option[Int],
      preGapWeeklyMedianKm: Option[Double],
      trainingTypeDistribution: Map[String, Double],
      currentVdot: Option[Double] = None,
      preGapVdot: Option[Double] = None)

  /** `activities` columns: activity_date (date), total_distance_km,
    * training_type. `asOf` bounds the analysis (inclusive).
    *
    * Gap + baseline semantics follow fitness_assessor.py:61-131 (ADVICE r1):
    * the LARGEST >= 7-day gap within the lookback window wins — the scan
    * keeps a gap only when `gap_days > 7 * gap_weeks_so_far`, so a later
    * equal gap overrides unless the gap is an exact multiple of 7 — and the
    * pre-gap baseline takes activities in [asOf − 24 weeks, gap_end),
    * bucketed by the CONFIGURED week start (utils/week.py), summed with
    * null distances as 0, then the median rounded to 1 dp.
    */
  def assess(spark: SparkSession, activities: DataFrame,
      asOf: java.sql.Date, lookbackWeeks: Int = 8,
      weekStartDay: Int = 0, vo2max: Option[DataFrame] = None): Assessment = {
    val upTo = activities.where(col("activity_date") <= lit(asOf)).cache()
    try {
      val cutoff = date_sub(lit(asOf), 7 * lookbackWeeks)

      val recent = upTo.where(col("activity_date") > cutoff)
      val recentRow = recent.agg(
        coalesce(sum("total_distance_km"), lit(0.0)).as("km"),
        count(lit(1)).as("n")).head()
      val eightWeekKm = recentRow.getAs[Double]("km")
      val runsPerWeek = recentRow.getAs[Long]("n") / lookbackWeeks.toDouble

      // Distinct window dates are bounded by the lookback span (≤ 7·weeks
      // rows) — the sequential keep-the-largest scan runs on the driver,
      // exactly like the reference's loop, on a provably bounded set.
      val dates = recent.select(col("activity_date")).distinct()
        .orderBy("activity_date").collect()
        .map(_.getAs[java.sql.Date]("activity_date"))
      var gapWeeks = 0
      var gapEnd: Option[java.sql.Date] = None
      var gapDays: Option[Int] = None
      for (i <- 1 until dates.length) {
        // Calendar-day subtraction ((curr_d - prev_d).days in the
        // reference) — epoch-millis division undercounts by one across a
        // spring-forward boundary under a DST-observing JVM zone.
        val g = java.time.temporal.ChronoUnit.DAYS.between(
          dates(i - 1).toLocalDate, dates(i).toLocalDate).toInt
        if (g >= 7 && g > gapWeeks * 7) {
          gapWeeks = g / 7
          gapEnd = Some(dates(i))
          gapDays = Some(g)
        }
      }

      val preGapMedian = gapEnd.flatMap { end =>
        val weekly = upTo
          .where(col("activity_date") >= date_sub(lit(asOf), 7 * 24) &&
            col("activity_date") < lit(end))
          .groupBy(graft.operators.Aggregates
            .weekStartCol(col("activity_date"), weekStartDay).as("week_start"))
          .agg(sum(coalesce(col("total_distance_km"), lit(0.0))).as("wkm"))
        val med = weekly.agg(median(col("wkm"))).head().get(0)
        Option(med).map(m => round1(m.asInstanceOf[Double]))
      }
      val latestGapDays = gapDays

      val dist = upTo.where(col("activity_date") > cutoff)
        .groupBy("training_type").count().collect()
      val total = dist.map(_.getAs[Long]("count")).sum.toDouble
      val typeDist =
        if (total == 0) Map.empty[String, Double]
        else dist.map(r => Option(r.getAs[String]("training_type")).getOrElse("unknown")
          -> r.getAs[Long]("count") / total).toMap

      // VDOT (fitness_assessor.py:146-191): latest VO2max in the window
      // (vdot = vo2·0.98) else best recent ≥3 km performance; pre-gap VDOT
      // from the latest VO2max before gap_end over the 24-week baseline.
      def latestVo2(from: Column, until: Option[java.sql.Date]): Option[Double] =
        vo2max.flatMap { v =>
          val bounded = until.fold(v.where(col("activity_date") >= from))(u =>
            v.where(col("activity_date") >= from &&
              col("activity_date") < lit(u)))
          bounded.where(col("activity_date") <= lit(asOf))
            .orderBy(col("activity_date").desc).limit(1)
            .select(col("precise_value").cast("double")).collect()
            .headOption.flatMap(r =>
              if (r.isNullAt(0)) None else Some(r.getDouble(0)))
        }
      val hasPerf = activities.columns.contains("total_time_seconds")
      // Reference selection (fitness_assessor.py:168-184): truthy time —
      // a 0-second row is excluded, not sorted first into vdot=∞ — and the
      // best row is the one with the smallest STORED avg_pace when the
      // column exists (computed pace only as fallback for null pace rows).
      val paceOrder =
        if (activities.columns.contains("avg_pace_seconds_per_km"))
          coalesce(col("avg_pace_seconds_per_km").cast("double"),
            col("total_time_seconds") / col("total_distance_km"))
        else col("total_time_seconds") / col("total_distance_km")
      val currentVdot = latestVo2(cutoff, None).map(v =>
        round1(Vdot.vdotFromVo2max(v)))
        .orElse {
          if (!hasPerf) None
          else recent
            .where(col("total_distance_km") >= 3.0 &&
              col("total_time_seconds") > 0.0)
            .orderBy(paceOrder.asc)
            .limit(1)
            .select("total_distance_km", "total_time_seconds").collect()
            .headOption.map(r => round1(Vdot.vdotFromRace(
              r.getAs[Double]("total_distance_km"),
              r.getAs[Double]("total_time_seconds").toLong)))
        }
      val preGapVdot = gapEnd.flatMap(end =>
        latestVo2(date_sub(lit(asOf), 7 * 24), Some(end)))
        .map(v => round1(Vdot.vdotFromVo2max(v)))

      Assessment(eightWeekKm, runsPerWeek, latestGapDays, preGapMedian,
        typeDist, currentVdot, preGapVdot)
    } finally upTo.unpersist()
  }
}
