package graft

import org.apache.spark.sql.types._

/** Explicit StructTypes for the silver tables (SURVEY §7.1 step 1; DDL
  * source: reference docs/spec/duckdb_schema_mapping.md — table inventory
  * at :58-83, column detail per-table in that file). Enforced on write via
  * [[Schemas.conform]]: the reference versions its schema and CI-checks
  * drift; here the StructType constants are the contract and writers
  * project/cast to them (schema-on-write for silver, schema-on-read only
  * for bronze JSON).
  *
  * Surrogate ids (measurement_id, eval_id, ...) are omitted: they exist in
  * DuckDB for row identity, which parquet + the documented natural keys
  * (UNIQUE date, activity_id, ...) already provide. FK constraints were
  * deliberately dropped by the reference (migration remove_fk_constraints)
  * — integrity is the pipeline's job, matching Spark semantics exactly.
  */
object Schemas {

  private def s(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  val activities: StructType = s(
    "activity_id" -> LongType, "activity_name" -> StringType,
    "activity_type" -> StringType, "location_name" -> StringType,
    "distance_m" -> DoubleType, "total_distance_km" -> DoubleType,
    "duration_seconds" -> DoubleType, "average_speed" -> DoubleType,
    "avg_heart_rate" -> DoubleType, "max_heart_rate" -> DoubleType,
    "min_heart_rate" -> DoubleType, "start_time_gmt" -> TimestampType,
    "activity_date" -> DateType, "training_type" -> StringType)

  val bodyComposition: StructType = s(
    "date" -> DateType, "weight_kg" -> DoubleType,
    "body_fat_percentage" -> DoubleType, "muscle_mass_kg" -> DoubleType,
    "bone_mass_kg" -> DoubleType, "bmi" -> DoubleType,
    "hydration_percentage" -> DoubleType)

  val splits: StructType = s(
    "activity_id" -> LongType, "split_index" -> IntegerType,
    "intensity_type" -> StringType, "distance" -> DoubleType,
    "duration_seconds" -> DoubleType, "average_speed" -> DoubleType,
    "grade_adjusted_speed" -> DoubleType, "pace_seconds_per_km" -> DoubleType,
    "heart_rate" -> DoubleType, "max_heart_rate" -> DoubleType,
    "cadence" -> DoubleType, "max_cadence" -> DoubleType,
    "power" -> DoubleType, "max_power" -> DoubleType,
    "normalized_power" -> DoubleType, "stride_length" -> DoubleType,
    "ground_contact_time" -> DoubleType, "vertical_oscillation" -> DoubleType,
    "vertical_ratio" -> DoubleType, "elevation_gain" -> DoubleType,
    "elevation_loss" -> DoubleType,
    // derived at ingest (SplitsEnrich)
    "hr_zone" -> StringType, "role_phase" -> StringType,
    "cadence_rating" -> StringType, "power_efficiency" -> StringType,
    "terrain_type" -> StringType, "environmental_conditions" -> StringType,
    "wind_impact" -> StringType, "temp_impact" -> StringType,
    "environmental_impact" -> StringType)

  val timeSeriesMetrics: StructType = s(
    "activity_id" -> LongType, "seq_no" -> IntegerType,
    "timestamp_s" -> DoubleType, "heart_rate" -> DoubleType,
    "speed" -> DoubleType, "cadence" -> DoubleType, "power" -> DoubleType,
    "ground_contact_time" -> DoubleType, "vertical_oscillation" -> DoubleType,
    "vertical_ratio" -> DoubleType, "elevation" -> DoubleType,
    "air_temperature" -> DoubleType, "sum_distance" -> DoubleType)

  val performanceTrends: StructType = {
    val phaseCols = Seq("warmup", "run", "recovery", "cooldown").flatMap { p =>
      Seq(s"${p}_splits" -> (StringType: DataType),
        s"${p}_avg_pace_seconds_per_km" -> (DoubleType: DataType),
        s"${p}_avg_pace_str" -> (StringType: DataType),
        s"${p}_avg_hr" -> (DoubleType: DataType),
        s"${p}_avg_cadence" -> (DoubleType: DataType),
        s"${p}_avg_power" -> (DoubleType: DataType),
        s"${p}_evaluation" -> (StringType: DataType))
    }
    s(Seq(
      "activity_id" -> (LongType: DataType),
      "workout_structure" -> (StringType: DataType),
      "hr_drift_percentage" -> (DoubleType: DataType),
      "pace_consistency" -> (DoubleType: DataType),
      "cadence_consistency" -> (StringType: DataType),
      "fatigue_pattern" -> (StringType: DataType)) ++ phaseCols :+
      ("pace_consistency_full" -> (DoubleType: DataType)): _*)
  }

  /** Full reference contract (duckdb_schema_mapping.md §6 generated
    * schema): per metric avg/min/max/std + star rating + evaluation text;
    * gct_variability = std/avg·100; vo_trend is the consistency narrative.
    */
  val formEfficiency: StructType = s(
    "activity_id" -> LongType,
    "gct_average" -> DoubleType, "gct_min" -> DoubleType,
    "gct_max" -> DoubleType, "gct_std" -> DoubleType,
    "gct_variability" -> DoubleType, "gct_rating" -> StringType,
    "gct_evaluation" -> StringType,
    "vo_average" -> DoubleType, "vo_min" -> DoubleType,
    "vo_max" -> DoubleType, "vo_std" -> DoubleType,
    "vo_trend" -> StringType, "vo_rating" -> StringType,
    "vo_evaluation" -> StringType,
    "vr_average" -> DoubleType, "vr_min" -> DoubleType,
    "vr_max" -> DoubleType, "vr_std" -> DoubleType,
    "vr_rating" -> StringType, "vr_evaluation" -> StringType)

  val formEvaluations: StructType = s(
    "activity_id" -> LongType, "evaluated_at" -> TimestampType,
    "gct_delta_pct" -> FloatType, "gct_penalty" -> FloatType,
    "vo_delta_pct" -> FloatType, "vo_penalty" -> FloatType,
    "vr_delta_pct" -> FloatType, "vr_penalty" -> FloatType,
    "score" -> FloatType, "gct_needs_improvement" -> BooleanType,
    "vo_needs_improvement" -> BooleanType, "vr_needs_improvement" -> BooleanType)

  val formBaselineHistory: StructType = s(
    "user_id" -> StringType, "condition_group" -> StringType,
    "metric" -> StringType, "trained_at" -> TimestampType,
    "window_months" -> IntegerType, "coef_a" -> DoubleType,
    "coef_b" -> DoubleType, "rmse" -> DoubleType, "n_samples" -> LongType,
    "speed_min" -> DoubleType, "speed_max" -> DoubleType)

  val hrEfficiency: StructType = s(
    "activity_id" -> LongType, "intensity_category" -> StringType,
    "zone1_pct" -> DoubleType, "zone2_pct" -> DoubleType,
    "zone3_pct" -> DoubleType, "zone4_pct" -> DoubleType,
    "zone5_pct" -> DoubleType, "zone_distribution_rating" -> StringType)

  val heartRateZones: StructType = s(
    "activity_id" -> LongType, "zone_number" -> IntegerType,
    "lower_bpm" -> DoubleType, "secs_in_zone" -> DoubleType)

  val vo2Max: StructType = s(
    "activity_id" -> LongType, "activity_date" -> DateType,
    "vo2_max_value" -> DoubleType, "precise_value" -> DoubleType)

  val lactateThreshold: StructType = s(
    "activity_id" -> LongType, "activity_date" -> DateType,
    "speed_mps" -> DoubleType, "heart_rate_bpm" -> DoubleType)

  /** Reference daily_wellness (duckdb_schema_mapping.md §21). Two column
    * names deviate deliberately and are kept stable for the API surface:
    * hrv_overnight (ref: hrv_overnight_ms) and readiness
    * (ref: training_readiness).
    */
  val dailyWellness: StructType = s(
    "date" -> DateType, "resting_hr" -> DoubleType,
    "hrv_overnight" -> DoubleType, "hrv_status" -> StringType,
    "hrv_baseline_low" -> DoubleType, "hrv_baseline_high" -> DoubleType,
    "sleep_seconds" -> IntegerType, "sleep_score" -> IntegerType,
    "readiness" -> IntegerType, "body_battery_high" -> IntegerType,
    "body_battery_low" -> IntegerType, "stress_avg" -> IntegerType,
    "source" -> StringType)

  /** Append-only versioned JSON-payload tables share one shape
    * (section_analyses / trend_analyses / weekly_reviews /
    * season_retrospectives — latest-version-wins read via the
    * row_number()=1 window, operators.Windows).
    */
  val versionedAnalysis: StructType = s(
    "key" -> StringType, "period_start" -> DateType,
    "created_at" -> TimestampType, "payload_json" -> StringType)

  val athleteProfile: StructType = s(
    "user_id" -> StringType, "current_focus" -> StringType,
    "focus_notes" -> StringType, "week_start_day" -> IntegerType,
    "updated_at" -> TimestampType,
    // engine-side extras consumed by the domain layer (not in the
    // reference profile DDL, which keeps weight in body_composition)
    "weight_kg" -> DoubleType, "max_hr" -> IntegerType,
    "resting_hr" -> IntegerType)

  // -------- athlete / operations tables (duckdb_schema_mapping.md §17-24).
  // Surrogate PKs (goal_id, retro_id, review_id, analysis_id, run_id) are
  // kept here, unlike the per-activity tables: they ARE the documented
  // ordering/identity keys for these append-style tables (e.g. goal
  // selection orders by goal_id DESC).

  val athleteGoals: StructType = s(
    "goal_id" -> IntegerType, "user_id" -> StringType,
    "race_name" -> StringType, "race_date" -> DateType,
    "priority" -> StringType, "goal_type" -> StringType,
    "distance_km" -> DoubleType, "target_time_seconds" -> IntegerType,
    "status" -> StringType, "notes" -> StringType,
    "created_at" -> TimestampType, "updated_at" -> TimestampType)

  val seasonRetrospectives: StructType = s(
    "retro_id" -> IntegerType, "user_id" -> StringType,
    "season_label" -> StringType, "period_start" -> DateType,
    "period_end" -> DateType, "narrative" -> StringType,
    "key_learnings" -> StringType, "created_at" -> TimestampType)

  val weeklyReviews: StructType = s(
    "review_id" -> IntegerType, "user_id" -> StringType,
    "week_start_date" -> DateType, "week_end_date" -> DateType,
    "review_date" -> DateType, "review_data" -> StringType,
    "created_at" -> TimestampType, "agent_name" -> StringType,
    "agent_version" -> StringType)

  /** category_counts is the raw JSON text on disk (DuckDB JSON column);
    * readers parse it with from_json(MapType) — see
    * ingest.StrengthSessions.
    */
  val strengthSessions: StructType = s(
    "activity_id" -> LongType, "activity_date" -> DateType,
    "start_time_local" -> TimestampType, "activity_name" -> StringType,
    "active_duration_seconds" -> IntegerType,
    "elapsed_duration_seconds" -> IntegerType,
    "avg_heart_rate" -> IntegerType, "max_heart_rate" -> IntegerType,
    "calories" -> IntegerType, "active_sets" -> IntegerType,
    "total_sets" -> IntegerType, "category_counts" -> StringType,
    "ingested_at" -> TimestampType)

  val sectionAnalyses: StructType = s(
    "analysis_id" -> IntegerType, "activity_id" -> LongType,
    "activity_date" -> DateType, "section_type" -> StringType,
    "analysis_data" -> StringType, "created_at" -> TimestampType,
    "agent_name" -> StringType, "agent_version" -> StringType,
    "run_id" -> LongType)

  val trendAnalyses: StructType = s(
    "analysis_id" -> IntegerType, "user_id" -> StringType,
    "granularity" -> StringType, "period_start" -> DateType,
    "period_end" -> DateType, "analysis_data" -> StringType,
    "created_at" -> TimestampType, "agent_name" -> StringType,
    "agent_version" -> StringType)

  val syncRuns: StructType = s(
    "run_id" -> IntegerType, "started_at" -> TimestampType,
    "finished_at" -> TimestampType, "domains" -> StringType,
    "results" -> StringType, "status" -> StringType)

  val analysisRuns: StructType = s(
    "run_id" -> LongType, "started_at" -> TimestampType)

  val all: Map[String, StructType] = Map(
    "activities" -> activities, "body_composition" -> bodyComposition,
    "splits" -> splits, "time_series_metrics" -> timeSeriesMetrics,
    "performance_trends" -> performanceTrends,
    "form_efficiency" -> formEfficiency,
    "form_evaluations" -> formEvaluations,
    "form_baseline_history" -> formBaselineHistory,
    "hr_efficiency" -> hrEfficiency, "heart_rate_zones" -> heartRateZones,
    "vo2_max" -> vo2Max, "lactate_threshold" -> lactateThreshold,
    "daily_wellness" -> dailyWellness,
    "athlete_profile" -> athleteProfile,
    "athlete_goals" -> athleteGoals,
    "season_retrospectives" -> seasonRetrospectives,
    "weekly_reviews" -> weeklyReviews,
    "strength_sessions" -> strengthSessions,
    "section_analyses" -> sectionAnalyses,
    "trend_analyses" -> trendAnalyses,
    "sync_runs" -> syncRuns,
    "analysis_runs" -> analysisRuns)

  /** Project + cast a frame to a table's contract. Missing columns become
    * typed nulls (the reference's nullable-by-default DDL); extra columns
    * are dropped; mismatched types cast or fail analysis.
    */
  def conform(df: org.apache.spark.sql.DataFrame, table: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val target = all.getOrElse(table,
      throw new IllegalArgumentException(s"unknown silver table: $table"))
    val present = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
