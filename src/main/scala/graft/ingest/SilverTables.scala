package graft.ingest

import graft.domain.Performance
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-activity silver tables derived at ingest (SURVEY §2.9):
  * performance_trends (structure-aware HR drift + pace consistency) and
  * hr_efficiency (zone distribution + intensity-category resolution).
  * Rules from reference inserters/performance_trends.py and
  * inserters/hr_efficiency.py.
  */
object SilverTables {

  /** performance_trends: one row per activity. The drift rule is
    * sequential over ordered laps -> per-activity flatMapGroups (same
    * placement as the intensity estimator); pace consistency is the
    * fragment-robust CV over run laps (laps below 0.5x the median distance
    * are GPS fragments).
    */
  def performanceTrends(spark: SparkSession, splits: DataFrame): DataFrame = {
    import spark.implicits._
    val drift = splits
      .select(col("activity_id"), col("split_index"), col("intensity_type"),
        col("pace_seconds_per_km"), col("heart_rate"))
      .as[(Long, Int, Option[String], Option[Double], Option[Double])]
      .groupByKey(_._1)
      .mapGroups { (aid, it) =>
        val laps = it.toSeq.sortBy(_._2)
          .map(l => Performance.Lap(l._3, l._4, l._5))
        (aid, Performance.classifyWorkoutStructure(laps),
          Performance.hrDrift(laps))
      }
      .toDF("activity_id", "workout_structure", "hr_drift_percentage")

    val run = splits.where(
      upper(col("intensity_type")).isin(Performance.WorkIntensities.toSeq: _*))
    val med = run.groupBy("activity_id")
      .agg(median(col("distance")).as("med_dist"))
    val robust = run.join(broadcast(med), "activity_id")
      .where(col("distance") >= col("med_dist") * 0.5)
      .groupBy("activity_id")
      .agg((stddev("pace_seconds_per_km") / avg("pace_seconds_per_km"))
        .as("pace_consistency"))
    val full = run.groupBy("activity_id")
      .agg((stddev("pace_seconds_per_km") / avg("pace_seconds_per_km"))
        .as("pace_consistency_full"))

    graft.Schemas.conform(
      drift.join(robust, Seq("activity_id"), "left")
        .join(full, Seq("activity_id"), "left"),
      "performance_trends")
  }

  private val canonicalCategory: org.apache.spark.sql.Column = {
    val t = lower(col("training_type"))
    when(t.isNull, "unknown")
      .when(t.isin("aerobic_base", "recovery", "low_moderate", "base",
        "warmup", "easy"), "easy")
      .when(t.isin("tempo", "tempo_run"), "tempo")
      .when(t.isin("lactate_threshold", "threshold_work", "threshold"), "threshold")
      .when(t.isin("vo2max", "vo2_max", "anaerobic_capacity", "anaerobic",
        "interval_sprint", "speed", "sprint"), "vo2max")
      .otherwise("unknown")
  }

  /** hr_efficiency: per-zone % of total time + intensity category. The
    * category starts from the canonical training-type label and is refined
    * by the actual distribution: a Zone3-dominant (primary zone 3,
    * zone3 >= 50 %) easy/unknown run with zone4+5 < 15 % is a controlled
    * MODERATE effort, not a failed easy run (reference
    * hr_efficiency.py:57-91).
    */
  def hrEfficiency(hrZones: DataFrame, activities: DataFrame): DataFrame = {
    val w = Window.partitionBy("activity_id")
    val pcts = hrZones
      .withColumn("total", sum("secs_in_zone").over(w))
      .withColumn("pct",
        when(col("total") > 0,
          round(col("secs_in_zone") / col("total") * 100.0, 2)).otherwise(0.0))
      .groupBy("activity_id")
      .agg(
        max(when(col("zone_number") === 1, col("pct"))).as("zone1_pct"),
        max(when(col("zone_number") === 2, col("pct"))).as("zone2_pct"),
        max(when(col("zone_number") === 3, col("pct"))).as("zone3_pct"),
        max(when(col("zone_number") === 4, col("pct"))).as("zone4_pct"),
        max(when(col("zone_number") === 5, col("pct"))).as("zone5_pct"),
        max_by(col("zone_number"), col("secs_in_zone")).as("primary_zone_num"))
    val joined = pcts.join(
      broadcast(activities.select(col("activity_id"), col("training_type"))),
      Seq("activity_id"), "left")
    val refined =
      when(canonicalCategory.isin("easy", "unknown") &&
          col("primary_zone_num") === 3 &&
          col("zone3_pct") >= 50.0 &&
          (col("zone4_pct") + col("zone5_pct")) < 15.0, "moderate")
        .otherwise(canonicalCategory)
    graft.Schemas.conform(
      joined.withColumn("intensity_category", refined),
      "hr_efficiency")
  }

  /** form_evaluations: per-activity observation scored against the trained
    * baselines (reference form_baseline/evaluator.py wiring:
    * predictor expectations -> scorer deltas/penalties -> one row per
    * activity). Model coefficients are driver-side scalars (they came out
    * of the monthly trainer), so the scoring is pure column math — no
    * collect of observations.
    */
  def formEvaluations(observations: DataFrame,
      gct: graft.domain.FormBaseline.GctPowerModel,
      vo: graft.domain.FormBaseline.LinearModel,
      vr: graft.domain.FormBaseline.LinearModel,
      evaluatedAt: java.sql.Timestamp): DataFrame = {
    val speed = lit(1000.0) / col("pace_seconds_per_km")
    // expectations from the models, inlined as column math
    val gctExp = exp((log(speed) - lit(gct.alpha)) / lit(gct.d)) // predictInverse
    val voExp = lit(vo.a) + lit(vo.b) * speed
    val vrExp = lit(vr.a) + lit(vr.b) * speed
    val gctDelta = (col("gct_ms") - gctExp) / gctExp * 100.0
    val voDelta = (col("vo_cm") - voExp) / voExp * 100.0
    val vrDelta = (col("vr_pct") - vrExp) / vrExp * 100.0
    def penalty(delta: org.apache.spark.sql.Column, improveFactor: Double) = {
      val factor = when(delta < 0, improveFactor).otherwise(1.0)
      least(lit(100.0), greatest(lit(0.0), abs(delta) * factor * 10.0))
    }
    val pg = penalty(gctDelta, 0.3)
    val pv = penalty(voDelta, 0.3)
    val pr = penalty(vrDelta, 0.2)
    val spreadMax = greatest(gctDelta, voDelta, vrDelta)
    val spreadMin = least(gctDelta, voDelta, vrDelta)
    val spread = spreadMax - spreadMin
    val adjustment =
      when(spreadMax <= 0,
        least(lit(5.0), abs(gctDelta + voDelta + vrDelta) / 3.0 * 0.5))
        .when(spread > 15.0, -10.0)
        .when(spread > 10.0, -5.0)
        .when(spread > 5.0, -2.0)
        .otherwise(0.0)
    val score = greatest(lit(0.0), least(lit(100.0),
      lit(100.0) - (pg + pv + pr) / 3.0 + adjustment))
    graft.Schemas.conform(
      observations.select(
        col("activity_id"),
        lit(evaluatedAt).as("evaluated_at"),
        gctDelta.as("gct_delta_pct"), pg.as("gct_penalty"),
        voDelta.as("vo_delta_pct"), pv.as("vo_penalty"),
        vrDelta.as("vr_delta_pct"), pr.as("vr_penalty"),
        score.as("score"),
        (pg > 20.0).as("gct_needs_improvement"),
        (pv > 20.0).as("vo_needs_improvement"),
        (pr > 20.0).as("vr_needs_improvement")),
      "form_evaluations")
  }
}
