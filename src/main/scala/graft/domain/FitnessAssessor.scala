package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  final case class Assessment(
      eightWeekKm: Double,
      runsPerWeek: Double,
      latestGapDays: Option[Int],
      preGapWeeklyMedianKm: Option[Double],
      trainingTypeDistribution: Map[String, Double])

  /** `activities` columns: activity_date (date), total_distance_km,
    * training_type. `asOf` bounds the analysis (inclusive).
    */
  def assess(spark: SparkSession, activities: DataFrame,
      asOf: java.sql.Date): Assessment = {
    val upTo = activities.where(col("activity_date") <= lit(asOf)).cache()
    try {
      val eightWeeksAgo = date_sub(lit(asOf), 7 * 8)

      val recent = upTo.where(col("activity_date") > eightWeeksAgo)
      val recentRow = recent.agg(
        coalesce(sum("total_distance_km"), lit(0.0)).as("km"),
        count(lit(1)).as("n")).head()
      val eightWeekKm = recentRow.getAs[Double]("km")
      val runsPerWeek = recentRow.getAs[Long]("n") / 8.0

      // latest >= 7-day inter-run gap (any recency; the baseline below is
      // what's bounded to 24 weeks before the gap)
      val w = Window.orderBy("activity_date")
      val gaps = upTo.select(col("activity_date"))
        .distinct()
        .withColumn("prev", lag("activity_date", 1).over(w))
        .withColumn("gap", datediff(col("activity_date"), col("prev")))
        .where(col("gap") >= 7)
        .orderBy(desc("activity_date"))
        .limit(1)
        .collect()
        .headOption

      val (latestGapDays, preGapMedian) = gaps match {
        case None => (None, None)
        case Some(row) =>
          val gapEnd = row.getAs[java.sql.Date]("activity_date")
          val gapStart = row.getAs[java.sql.Date]("prev")
          val weekly = upTo
            .where(col("activity_date") <= lit(gapStart) &&
              col("activity_date") > date_sub(lit(gapStart), 7 * 24))
            .groupBy(weekofyear(col("activity_date")).as("wk"),
              year(col("activity_date")).as("yr"))
            .agg(sum("total_distance_km").as("wkm"))
          val med = weekly.agg(median(col("wkm"))).head().get(0)
          (Some(row.getAs[Int]("gap")),
            Option(med).map(_.asInstanceOf[Double]))
      }

      val dist = upTo.where(col("activity_date") > eightWeeksAgo)
        .groupBy("training_type").count().collect()
      val total = dist.map(_.getAs[Long]("count")).sum.toDouble
      val typeDist =
        if (total == 0) Map.empty[String, Double]
        else dist.map(r => Option(r.getAs[String]("training_type")).getOrElse("unknown")
          -> r.getAs[Long]("count") / total).toMap

      Assessment(eightWeekKm, runsPerWeek, latestGapDays, preGapMedian, typeDist)
    } finally upTo.unpersist()
  }
}
