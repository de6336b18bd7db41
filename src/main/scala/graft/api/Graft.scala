package graft.api

import graft.domain._
import graft.ingest.SilverWriter
import graft.operators.Aggregates
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Typed façade mirroring the reference's tool surface
  * (docs/mcp-tools-reference.md) over the silver tables: one method per
  * analytical tool family, each a thin shaping layer over the operator /
  * domain modules (single-source-of-truth per computation — the façade
  * never re-implements semantics, matching the reference's reader-owns-
  * the-logic rule, SURVEY §3.3).
  *
  * Layout contract: `root/<table>` parquet dirs (activities, splits,
  * heart_rate_zones, time_series_metrics, daily_wellness), written by
  * graft.ingest.SilverWriter. Non-analytical tools map as follows:
  * ingest_activity/catch_up_ingest -> sources.GarminJson +
  * streaming.Streams.catchUp; save/get profile + reviews -> plain
  * SilverWriter.upsertByPartition round trips; export -> SilverWriter.export.
  */
final class Graft(val spark: SparkSession, root: String) {

  def table(name: String): DataFrame = spark.read.parquet(s"$root/$name")

  private def splitsOf(activityId: Long): DataFrame =
    table("splits").where(col("activity_id") === activityId)

  /** Splits tools: projection groups with the reference's statistics_only
    * mode (aggregate before collect — the ~80 % output reduction is an API
    * design choice, SURVEY §4.1).
    */
  object splits {
    private val paceHrCols = Seq("split_index", "distance", "duration_seconds",
      "pace_seconds_per_km", "heart_rate", "max_heart_rate", "hr_zone")
    private val formCols = Seq("split_index", "cadence", "stride_length",
      "ground_contact_time", "vertical_oscillation", "vertical_ratio")
    private val elevationCols = Seq("split_index", "elevation_gain",
      "elevation_loss", "terrain_type")

    private def group(activityId: Long, cols: Seq[String],
        statisticsOnly: Boolean): DataFrame = {
      val df = splitsOf(activityId).select(cols.map(col): _*)
      if (!statisticsOnly) df.orderBy("split_index")
      else Aggregates.statsBlock(df.drop("split_index"), Seq.empty,
        cols.filterNot(c => c == "split_index" || c == "hr_zone" || c == "terrain_type"))
    }

    def paceHr(activityId: Long, statisticsOnly: Boolean = false): DataFrame =
      group(activityId, paceHrCols, statisticsOnly)
    def formMetrics(activityId: Long, statisticsOnly: Boolean = false): DataFrame =
      group(activityId, formCols, statisticsOnly)
    def elevation(activityId: Long, statisticsOnly: Boolean = false): DataFrame =
      group(activityId, elevationCols, statisticsOnly)
    def comprehensive(activityId: Long, statisticsOnly: Boolean = false): DataFrame =
      group(activityId,
        (paceHrCols ++ formCols.tail ++ elevationCols.tail).distinct, statisticsOnly)

    /** get_interval_analysis: segments + rep fatigue + recovery rates. */
    def intervalAnalysis(activityId: Long): Seq[Performance.Segment] = {
      val rows = splitsOf(activityId)
        .orderBy("split_index")
        .select("intensity_type", "duration_seconds", "heart_rate",
          "pace_seconds_per_km", "ground_contact_time")
        .collect()
      var t = 0.0
      rows.toSeq.map { r =>
        val dur = Option(r.getAs[java.lang.Double]("duration_seconds"))
          .map(_.doubleValue).getOrElse(0.0)
        val seg = Performance.Segment(
          Performance.segmentType(Option(r.getAs[String]("intensity_type"))),
          t, t + dur,
          Option(r.getAs[java.lang.Double]("heart_rate")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("pace_seconds_per_km"))
            .map(_.doubleValue / 60.0),
          Option(r.getAs[java.lang.Double]("ground_contact_time")).map(_.doubleValue))
        t += dur
        seg
      }
    }
  }

  /** Training-load tools. */
  object trainingLoad {
    /** get_acwr over the daily-load frame derived from activities. */
    def acwr(): DataFrame = {
      val daily = table("activities")
        .groupBy(col("activity_date"))
        .agg(sum("total_distance_km").as("load_km"))
        .withColumn("day_idx", datediff(col("activity_date"), lit("1970-01-01")))
        .withColumn("athlete", lit("default"))
      graft.operators.Stats.acwr(daily, "athlete", "day_idx", "load_km")
        .drop("athlete")
    }

    /** get_injury_risk: fused factors (callers supply the wellness/form
      * blocks they have; missing factors renormalize away).
      */
    def injuryRisk(acwrRatio: Option[Double], durabilityDirection: Option[String],
        wellnessAdverse: Option[(Int, Int)],
        formRatio: Option[(Double, Double)]): Option[InjuryRisk.Assessment] =
      InjuryRisk.assess(Map(
        "acwr" -> acwrRatio.map(InjuryRisk.acwrRisk),
        "durability" -> durabilityDirection.flatMap(InjuryRisk.durabilityRisk),
        "wellness" -> wellnessAdverse.flatMap { case (a, u) =>
          InjuryRisk.wellnessRisk(a, u) },
        "form_anomaly" -> formRatio.flatMap { case (r, base) =>
          InjuryRisk.formAnomalyRisk(r, base) }))
  }

  /** Physiology / recovery / wellness tools. */
  object physiology {
    /** get_recovery_status from the daily_wellness frame (date-ascending). */
    def recoveryStatus(): String = {
      val rows = table("daily_wellness")
        .orderBy("date")
        .select("resting_hr", "hrv_overnight", "hrv_baseline_low",
          "readiness", "sleep_score")
        .collect()
      val nights = rows.toSeq.map { r =>
        (Option(r.getAs[java.lang.Double]("hrv_overnight")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("hrv_baseline_low")).map(_.doubleValue))
      }
      val (_, under) = Recovery.hrvStreak(nights)
      val last = rows.lastOption
      Recovery.classify(
        last.flatMap(r => Option(r.getAs[java.lang.Integer]("readiness")).map(_.intValue)),
        last.flatMap(r => Option(r.getAs[java.lang.Integer]("sleep_score")).map(_.intValue)),
        under)
    }

    /** get_wellness_baseline_deviation for one metric column. */
    def wellnessDeviation(metricCol: String, direction: String): Wellness.MetricBaseline = {
      val rows = table("daily_wellness").orderBy("date")
        .select(col(metricCol).cast("double")).collect()
        .map(r => Option(r.getAs[java.lang.Double](0)).map(_.doubleValue)).toSeq
      Wellness.metricBaseline(rows.dropRight(1).takeRight(30),
        rows.lastOption.flatten, metricCol, direction)
    }
  }

  /** Fitness / race tools. */
  object fitness {
    def currentFitnessSummary(asOf: java.sql.Date): FitnessAssessor.Assessment =
      FitnessAssessor.assess(spark, table("activities"), asOf)

    /** get_race_readiness: blended predictions per standard distance. */
    def raceReadiness(vdot: Double,
        curveBuckets: Seq[(Double, Long)]): Map[String, RacePrediction.Prediction] =
      Map(5.0 -> "race_5k", 10.0 -> "race_10k", 21.0975 -> "half", 42.195 -> "full")
        .flatMap { case (km, key) =>
          RacePrediction.predict(Some(Vdot.predictRaceTime(vdot, km)),
            curveBuckets, km).map(key -> _)
        }
  }

  /** Time-series tools (z-anomalies come from domain.FormAnomaly over the
    * time_series_metrics frame shaped to its input contract).
    */
  object timeSeries {
    def formAnomalySummary(): DataFrame = {
      val ts = table("time_series_metrics").select(
        col("activity_id"), col("seq_no").cast("int").as("ts"),
        col("ground_contact_time").as("gct"),
        col("vertical_oscillation").as("vo"),
        col("vertical_ratio").as("vr"),
        col("elevation"),
        (lit(1000.0 / 60.0) / col("speed")).as("pace"),
        col("heart_rate"))
      FormAnomaly.materialEvents(FormAnomaly.detect(ts))
    }

    /** get_time_range_detail with the reference's half-open convention. */
    def timeRangeStats(activityId: Long, fromS: Int, untilS: Int,
        metric: String): DataFrame =
      table("time_series_metrics")
        .where(col("activity_id") === activityId &&
          col("seq_no") >= fromS && col("seq_no") < untilS)
        .agg(avg(metric).as("avg_v"), stddev(metric).as("stddev_v"),
          min(metric).as("min_v"), max(metric).as("max_v"),
          count(metric).as("n_rows"))
  }

  /** export tool: guarded sink. */
  def export(df: DataFrame, path: String, format: String = "parquet",
      maxRows: Long = 100000L): Long =
    SilverWriter.export(df, path, format, maxRows)
}
