package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze layer: raw per-activity JSON -> typed DataFrames with explicit
  * schemas (schema-on-read, no inference — inference would scan twice and
  * drift across activities).
  *
  * Source shapes follow the reference fixtures (FIXTURES.md §A; reference
  * pkg/database/inserters). Layout: `{root}/activity/{activityId}/
  * {activity,splits,hr_zones,weather,activity_details}.json`, one dir per
  * activity — the Spark reader globs all activities in one scan and derives
  * `activity_id` from the payload itself (not the path), matching the
  * reference inserters.
  *
  * Scale note: at 100 TB the bronze JSON would be ingested once into
  * activity_id-partitioned parquet (see SilverWriter) and never re-scanned;
  * these readers are the one-time conversion path, map-only, no shuffle.
  */
object GarminJson {

  // ---- activity.json → activities (reference: inserters/activities.py) ----
  val activitySchema: StructType = StructType(Seq(
    StructField("activityId", LongType),
    StructField("activityName", StringType),
    StructField("activityTypeDTO", StructType(Seq(
      StructField("typeId", LongType),
      StructField("typeKey", StringType),
      StructField("parentTypeId", LongType)))),
    StructField("locationName", StringType),
    StructField("summaryDTO", StructType(Seq(
      StructField("distance", DoubleType),
      StructField("duration", DoubleType),
      StructField("averageSpeed", DoubleType),
      StructField("averageHR", DoubleType),
      StructField("maxHR", DoubleType),
      StructField("minHR", DoubleType),
      StructField("startTimeLocal", StringType),
      StructField("startTimeGMT", StringType),
      StructField("trainingEffectLabel", StringType))))))

  def readActivities(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(activitySchema)
      .option("multiLine", "true")
      .json(s"$root/activity/*/activity.json")
      .select(
        col("activityId").as("activity_id"),
        col("activityName").as("activity_name"),
        col("activityTypeDTO.typeKey").as("activity_type"),
        col("locationName").as("location_name"),
        col("summaryDTO.distance").as("distance_m"),
        (col("summaryDTO.distance") / 1000.0).as("total_distance_km"),
        col("summaryDTO.duration").as("duration_seconds"),
        col("summaryDTO.averageSpeed").as("average_speed"),
        col("summaryDTO.averageHR").as("avg_heart_rate"),
        col("summaryDTO.maxHR").as("max_heart_rate"),
        col("summaryDTO.minHR").as("min_heart_rate"),
        to_timestamp(col("summaryDTO.startTimeGMT")).as("start_time_gmt"),
        to_date(col("summaryDTO.startTimeLocal")).as("activity_date"),
        lower(col("summaryDTO.trainingEffectLabel")).as("training_type"))

  // ---- splits.json → splits (reference: inserters/splits.py) ----
  val lapSchema: StructType = StructType(Seq(
    StructField("lapIndex", IntegerType),
    StructField("intensityType", StringType),
    StructField("distance", DoubleType),
    StructField("duration", DoubleType),
    StructField("startTimeGMT", StringType),
    StructField("averageSpeed", DoubleType),
    StructField("avgGradeAdjustedSpeed", DoubleType),
    StructField("averageHR", DoubleType),
    StructField("maxHR", DoubleType),
    StructField("averageRunCadence", DoubleType),
    StructField("maxRunCadence", DoubleType),
    StructField("averagePower", DoubleType),
    StructField("maxPower", DoubleType),
    StructField("normalizedPower", DoubleType),
    StructField("strideLength", DoubleType),
    StructField("groundContactTime", DoubleType),
    StructField("verticalOscillation", DoubleType),
    StructField("verticalRatio", DoubleType),
    StructField("elevationGain", DoubleType),
    StructField("elevationLoss", DoubleType)))

  val splitsSchema: StructType = StructType(Seq(
    StructField("activityId", LongType),
    StructField("lapDTOs", ArrayType(lapSchema))))

  def readSplits(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(splitsSchema)
      .option("multiLine", "true")
      .json(s"$root/activity/*/splits.json")
      .select(col("activityId").as("activity_id"), explode(col("lapDTOs")).as("lap"))
      .select(
        col("activity_id"),
        col("lap.lapIndex").as("split_index"),
        col("lap.intensityType").as("intensity_type"),
        col("lap.distance").as("distance"),
        col("lap.duration").as("duration_seconds"),
        col("lap.averageSpeed").as("average_speed"),
        col("lap.avgGradeAdjustedSpeed").as("grade_adjusted_speed"),
        // pace in sec/km from m/s; null-safe (0 speed -> null, not inf)
        when(col("lap.averageSpeed") > 0, lit(1000.0) / col("lap.averageSpeed"))
          .as("pace_seconds_per_km"),
        col("lap.averageHR").as("heart_rate"),
        col("lap.maxHR").as("max_heart_rate"),
        col("lap.averageRunCadence").as("cadence"),
        col("lap.maxRunCadence").as("max_cadence"),
        col("lap.averagePower").as("power"),
        col("lap.maxPower").as("max_power"),
        col("lap.normalizedPower").as("normalized_power"),
        col("lap.strideLength").as("stride_length"),
        col("lap.groundContactTime").as("ground_contact_time"),
        col("lap.verticalOscillation").as("vertical_oscillation"),
        col("lap.verticalRatio").as("vertical_ratio"),
        col("lap.elevationGain").as("elevation_gain"),
        col("lap.elevationLoss").as("elevation_loss"))

  // ---- hr_zones.json → heart_rate_zones ----
  val hrZoneSchema: StructType = StructType(Seq(
    StructField("zoneNumber", IntegerType),
    StructField("zoneLowBoundary", DoubleType),
    StructField("secsInZone", DoubleType)))

  /** A top-level JSON array in multiLine mode yields one row per element. */
  def readHrZones(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(hrZoneSchema)
      .option("multiLine", "true")
      .json(s"$root/activity/*/hr_zones.json")
      .select(activityIdFromPath(input_file_name()).as("activity_id"),
        col("zoneNumber").as("zone_number"),
        col("zoneLowBoundary").as("lower_bpm"),
        col("secsInZone").as("secs_in_zone"))

  /** hr_zones.json is a bare JSON array (no activityId field), so the
    * activity id comes from the directory name — the one bronze source
    * where `input_file_name` is load-bearing.
    */
  private def activityIdFromPath(path: org.apache.spark.sql.Column) =
    regexp_extract(path, "/activity/(\\d+)/", 1).cast("long")

  // ---- weather.json → per-activity weather ----
  val weatherSchema: StructType = StructType(Seq(
    StructField("temp", DoubleType),
    StructField("apparentTemp", DoubleType),
    StructField("dewPoint", DoubleType),
    StructField("relativeHumidity", DoubleType),
    StructField("windSpeed", DoubleType),
    StructField("windDirection", DoubleType),
    StructField("windDirectionCompassPoint", StringType)))

  def readWeather(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(weatherSchema)
      .option("multiLine", "true")
      .json(s"$root/activity/*/weather.json")
      .select(input_file_name().as("path"), col("*"))
      .select(activityIdFromPath(col("path")).as("activity_id"),
        // fixtures carry °F (FIXTURES.md §A) — stored Celsius, converted once
        ((col("temp") - 32.0) * 5.0 / 9.0).as("temp_celsius"),
        col("relativeHumidity").as("humidity_pct"),
        col("windSpeed").as("wind_kmh"),
        col("windDirection").as("wind_direction_deg"),
        col("windDirectionCompassPoint").as("wind_compass"))

  // ---- activity_details.json → time_series_metrics ----
  val detailsSchema: StructType = StructType(Seq(
    StructField("activityId", LongType),
    StructField("measurementCount", IntegerType),
    StructField("metricsCount", IntegerType),
    StructField("metricDescriptors", ArrayType(StructType(Seq(
      StructField("metricsIndex", IntegerType),
      StructField("key", StringType),
      StructField("unit", StructType(Seq(
        StructField("id", LongType),
        StructField("key", StringType),
        StructField("factor", DoubleType)))))))),
    StructField("activityDetailMetrics", ArrayType(StructType(Seq(
      StructField("metrics", ArrayType(DoubleType))))))))

  /** Recognized metric keys -> output column (reference
    * `time_series_metrics.py:81-108`; subset covering the analytics the
    * engine computes — the map is data-driven, extending it is one entry).
    */
  val metricColumns: Seq[(String, String)] = Seq(
    "directHeartRate" -> "heart_rate",
    "directSpeed" -> "speed",
    "directDoubleCadence" -> "cadence",
    "directPower" -> "power",
    "directGroundContactTime" -> "ground_contact_time",
    "directVerticalOscillation" -> "vertical_oscillation",
    "directVerticalRatio" -> "vertical_ratio",
    "directElevation" -> "elevation",
    "directAirTemperature" -> "air_temperature",
    "sumDuration" -> "timestamp_s",
    "sumDistance" -> "sum_distance")

  /** Positional `metrics` arrays decoded via the per-activity descriptor
    * map. The unit `factor` is DELIBERATELY IGNORED — values arrive already
    * SI despite the descriptor (documented Garmin API inconsistency,
    * reference `time_series_metrics.py:174-186`).
    */
  def readTimeSeries(spark: SparkSession, root: String): DataFrame = {
    val raw = spark.read.schema(detailsSchema)
      .option("multiLine", "true")
      .json(s"$root/activity/*/activity_details.json")
    val withMap = raw.select(
      col("activityId").as("activity_id"),
      map_from_entries(expr(
        "transform(metricDescriptors, d -> struct(d.key, d.metricsIndex))"))
        .as("descr"),
      posexplode(col("activityDetailMetrics")).as(Seq("seq_no", "row")))
    val metricCols = metricColumns.map { case (key, out) =>
      // metricsIndex is 0-based; element_at is 1-based
      expr(s"row.metrics[descr['$key']]").as(out)
    }
    withMap.select(col("activity_id") +: col("seq_no") +: metricCols: _*)
  }
}
