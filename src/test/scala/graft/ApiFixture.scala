package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared miniature silver-root fixture for the facade specs (ApiSpec +
  * ApiShapeSpec): five splits of one interval workout, 30 daily
  * activities, a profile, a month of wellness, and time-series rows with
  * hand-computable durability/heat structure. Built once per JVM.
  */
object ApiFixture {
  lazy val root: String = build(TestSession.spark)

  private def build(spark: SparkSession): String = {

    import spark.implicits._
    val d = Files.createTempDirectory("graft-api").toString
    Seq(
      (100L, 1, "WARMUP", 1000.0, 400.0, 410.0, 135.0, 170.0, 250.0, "Zone 2", 8.0, 1.0, "平坦"),
      (100L, 2, "INTERVAL", 1000.0, 280.0, 290.0, 165.0, 182.0, 238.0, "Zone 4", 9.0, 2.0, "平坦"),
      (100L, 3, "RECOVERY", 1000.0, 500.0, 510.0, 140.0, 168.0, 255.0, "Zone 3", 8.2, 1.5, "平坦"),
      (100L, 4, "INTERVAL", 1000.0, 285.0, 295.0, 172.0, 184.0, 246.0, "Zone 4", 9.1, 2.1, "平坦"),
      (100L, 5, "COOLDOWN", 1000.0, 420.0, 430.0, 130.0, 160.0, 252.0, "Zone 2", 7.9, 0.8, "平坦"))
      .toDF("activity_id", "split_index", "intensity_type", "distance",
        "pace_seconds_per_km", "duration_seconds", "heart_rate", "max_heart_rate",
        "ground_contact_time", "hr_zone", "vertical_oscillation", "elevation_gain",
        "terrain_type")
      .withColumn("cadence", lit(178.0))
      .withColumn("stride_length", lit(95.0))
      .withColumn("vertical_ratio", lit(8.0))
      .withColumn("elevation_loss", lit(1.0))
      .write.parquet(s"$d/splits")
    (1 to 30).map { i =>
      // id 15 runs faster/longer so the similarity band has structure
      val speed = if (i == 15) 3.6 else 3.3 + (i % 5) * 0.02
      val dist = if (i == 15) 14.0 else 10.0
      (i.toLong, f"run $i%02d", java.sql.Date.valueOf(f"2026-06-$i%02d"),
        dist, "aerobic_base", speed, 140.0 + (i % 7))
    }.toDF("activity_id", "activity_name", "activity_date",
        "total_distance_km", "training_type", "average_speed",
        "avg_heart_rate")
      .write.parquet(s"$d/activities")
    Seq(("default", 6)).toDF("user_id", "week_start_day")
      .write.parquet(s"$d/athlete_profile")
    (1 to 30).map { i =>
      // HRV collapses below baseline the last two nights
      val hrv = if (i >= 29) 38.0 else 50.0
      (java.sql.Date.valueOf(f"2026-06-$i%02d"), 48.0, hrv, 45.0, 60, 70)
    }.toDF("date", "resting_hr", "hrv_overnight", "hrv_baseline_low",
        "readiness", "sleep_score")
      .write.parquet(s"$d/daily_wellness")
    locally {
      // time-series rows for the durability/heat tools: acts 1-3 fully
      // measured with hand-computable midpoint halves (mid = 15 s, first
      // half = samples at 0/10, second = 20/30), act 4 a single sample
      // (unusable span -> reference None), acts 5-12 temperature-only
      // (heat observations without durability rows)
      def m(id: Long, t: Double, hr: Option[Double], sp: Option[Double],
          gct: Option[Double], vo: Option[Double], vr: Option[Double],
          temp: Double) = (id, t, hr, sp, gct, vo, vr, temp)
      val fully = Seq(
        // act 1: HR 100->110 @ const speed = 10% decoupling; gct 250->257.5
        // = 3% fade; vo 8->8.4 = 5%; vr absent
        m(1L, 0.0, Some(100.0), Some(3.0), Some(250.0), Some(8.0), None, 20.0),
        m(1L, 10.0, Some(100.0), Some(3.0), Some(250.0), Some(8.0), None, 20.0),
        m(1L, 20.0, Some(110.0), Some(3.0), Some(255.0), Some(8.4), None, 30.0),
        m(1L, 30.0, Some(110.0), Some(3.0), Some(260.0), Some(8.4), None, 30.0),
        // act 2: 5% decoupling, no form metrics
        m(2L, 0.0, Some(100.0), Some(3.0), None, None, None, 10.0),
        m(2L, 10.0, Some(100.0), Some(3.0), None, None, None, 10.0),
        m(2L, 20.0, Some(105.0), Some(3.0), None, None, None, 10.0),
        m(2L, 30.0, Some(105.0), Some(3.0), None, None, None, 10.0),
        // act 3: perfectly durable (0%)
        m(3L, 0.0, Some(100.0), Some(3.0), None, None, None, 18.0),
        m(3L, 10.0, Some(100.0), Some(3.0), None, None, None, 18.0),
        m(3L, 20.0, Some(100.0), Some(3.0), None, None, None, 18.0),
        m(3L, 30.0, Some(100.0), Some(3.0), None, None, None, 18.0),
        // act 4: single sample -> empty span, excluded
        m(4L, 0.0, Some(100.0), Some(3.0), None, None, None, 14.0))
      val tempOnly = (5 to 12).flatMap(i => Seq(
        m(i.toLong, 0.0, None, None, None, None, None, 10.0 + i),
        m(i.toLong, 10.0, None, None, None, None, None, 10.0 + i)))
      (fully ++ tempOnly).toDF("activity_id", "timestamp_s", "heart_rate",
          "speed", "ground_contact_time", "vertical_oscillation",
          "vertical_ratio", "air_temperature")
        // seq_no/elevation so the timeSeries tools (formAnomalySummary,
        // timeRangeStats) resolve against this root too
        .withColumn("seq_no", col("timestamp_s").cast("int"))
        .withColumn("elevation", lit(10.0))
        .write.parquet(s"$d/time_series_metrics")
    }
    d
    }
}
