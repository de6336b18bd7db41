package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Form-anomaly detection over second-by-second time series (reference:
  * pkg/rag/queries/form_anomaly_detector.py:24-425 and
  * pkg/analysis/form_events.py:30-127 — semantics preserved exactly,
  * including window half-open conventions and gate constants).
  *
  * The reference walks Python lists per activity (~0.5 s/activity, memoized);
  * here the whole corpus is ONE windowed DataFrame plan: every rule is a
  * range window or conditional aggregate partitioned by (activity, metric),
  * so a 90-day sweep is a single pass instead of per-activity re-parsing.
  *
  * Input frame columns: activity_id, ts (int seconds), gct, vo, vr,
  * elevation, pace (min/km), heart_rate. Null metric values are skipped
  * exactly like the reference's None filtering.
  */
object FormAnomaly {

  val ZThreshold = 3.0
  val MaterialZ = 3.5
  val HighSeverityZ = 4.5
  val MinSustainedSeconds = 5
  val AdjacencyToleranceSec = 2

  /** metric key -> (source column, magnitude gate = degradation trigger).
    * All three form metrics are worse-when-higher.
    */
  val Metrics: Seq[(String, String, Double)] = Seq(
    ("directGroundContactTime", "gct", 10.0),
    ("directVerticalOscillation", "vo", 0.5),
    ("directVerticalRatio", "vr", 0.3))

  /** Sustained + cause-classified anomalies: one output row per anomalous
    * (activity, metric, second) with z-score, context deltas and cause.
    */
  def detect(ts: DataFrame): DataFrame = {
    val byAct = Window.partitionBy("activity_id")

    // --- per-second context shared by all metrics (computed pre-melt) ---
    // elevation spread over [t-5, t+5) , pace spread over [t-10, t+10)
    val wElev = byAct.orderBy("ts").rangeBetween(-5, 4)
    val wPace = byAct.orderBy("ts").rangeBetween(-10, 9)
    // HR drift: first-5-minutes baseline vs [t-60, t) trailing mean
    val wHr = byAct.orderBy("ts").rangeBetween(-60, -1)
    val context = ts
      .withColumn("elev_change",
        when(count("elevation").over(wElev) > 1,
          max("elevation").over(wElev) - min("elevation").over(wElev))
          .otherwise(0.0))
      .withColumn("pace_change",
        when(count("pace").over(wPace) > 1,
          max("pace").over(wPace) - min("pace").over(wPace))
          .otherwise(0.0))
      .withColumn("hr_baseline", avg(when(col("ts") < 300, col("heart_rate"))).over(byAct))
      .withColumn("hr_current", avg("heart_rate").over(wHr))
      .withColumn("hr_drift_pct",
        when(col("hr_baseline").isNotNull && col("hr_current").isNotNull,
          (col("hr_current") - col("hr_baseline")) / col("hr_baseline") * 100.0)
          .otherwise(0.0))

    // --- melt the three form metrics to long format ---
    val stackExpr = Metrics.map { case (key, c, _) => s"'$key', $c" }.mkString(", ")
    val long = context.selectExpr("activity_id", "ts", "elev_change",
        "pace_change", "hr_drift_pct",
        s"stack(${Metrics.size}, $stackExpr) AS (metric, value)")
    val gate = Metrics.map { case (key, _, g) => (key, g) }
      .foldLeft(lit(null).cast("double")) { case (acc, (key, g)) =>
        when(col("metric") === key, g).otherwise(acc)
      }

    // --- rolling baseline [t-30, t+30), >=2 non-null; sample stddev ---
    val byMetric = Window.partitionBy("activity_id", "metric")
    val wRoll = byMetric.orderBy("ts").rangeBetween(-30, 29)
    val rolled = long
      .withColumn("w_cnt", count("value").over(wRoll))
      .withColumn("roll_mean", avg("value").over(wRoll))
      .withColumn("roll_std", stddev("value").over(wRoll))

    // --- sustained first-vs-second-half degradation per (activity, metric):
    // split at floor(n/2) over the non-null values in time order ---
    val wOrd = byMetric.orderBy("ts")
    val degraded = rolled
      .withColumn("vrn",
        when(col("value").isNotNull, count("value").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("vn", count("value").over(byMetric))
      .withColumn("half_mark", floor(col("vn") / 2))
      .withColumn("first_mean",
        avg(when(col("vrn") <= col("half_mark"), col("value"))).over(byMetric))
      .withColumn("second_mean",
        avg(when(col("vrn") > col("half_mark"), col("value"))).over(byMetric))
      .withColumn("sustained_degradation",
        col("vn") >= 4 &&
          (col("second_mean") - col("first_mean")) >= gate)

    // --- z-score AND magnitude gate, worse (higher) direction only ---
    val dev = col("value") - col("roll_mean")
    val flagged = degraded
      .where(col("value").isNotNull && col("w_cnt") >= 2 && col("roll_std") > 0)
      .withColumn("z", dev / col("roll_std"))
      .where(col("z") > ZThreshold && dev >= gate)

    // --- sustained-run filter: flagged seconds with gaps <= 2 s bridge into
    // one run; keep runs spanning >= 5 s (lag + cumulative-sum grouping) ---
    val runs = flagged
      .withColumn("prev_ts", lag("ts", 1).over(wOrd))
      .withColumn("new_run",
        (col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > AdjacencyToleranceSec).cast("long"))
      .withColumn("run_id", sum("new_run").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wRun = Window.partitionBy("activity_id", "metric", "run_id")
    val sustained = runs
      .withColumn("run_span", max("ts").over(wRun) - min("ts").over(wRun) + 1)
      .where(col("run_span") >= MinSustainedSeconds)

    // --- cause classification, priority elevation > pace > fatigue ---
    sustained.select(
      col("activity_id"), col("ts"), col("metric"), col("value"),
      col("roll_mean").as("baseline"), col("z"),
      col("elev_change"), col("pace_change"), col("hr_drift_pct"),
      when(col("elev_change") > 5.0, "elevation_change")
        .when(col("pace_change") > 0.25, "pace_change")
        .when(abs(col("hr_drift_pct")) > 10.0 && col("sustained_degradation"),
          "fatigue")
        .otherwise("isolated").as("probable_cause"))
  }

  /** Material-event semantics (form_events.py): material = cause identified
    * AND z > 3.5; per-activity timestamps collapse into events when gaps
    * are <= 2 s; severity high when the event's max z > 4.5.
    */
  def materialEvents(anomalies: DataFrame): DataFrame = {
    val material = anomalies
      .where(col("probable_cause") =!= "isolated" && col("z") > MaterialZ)
      .groupBy("activity_id", "ts")
      .agg(max("z").as("z"), count(lit(1)).as("n_metrics"))
    val w = Window.partitionBy("activity_id").orderBy("ts")
    material
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_event",
        (col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > AdjacencyToleranceSec).cast("long"))
      .withColumn("event_id", sum("new_event").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("activity_id", "event_id")
      .agg(min("ts").as("start_ts"), max("ts").as("end_ts"),
        max("z").as("max_z"))
      .withColumn("high_severity", col("max_z") > HighSeverityZ)
  }

  /** Caution-flag rule (form_events.py:100-127): flag when the recent window
    * has >= 3 material events AND at least 2x the baseline event rate
    * scaled to the recent window's hours.
    */
  def cautionFlag(recentEvents: Long, recentHours: Double,
      baselineRatePerHour: Double): Boolean =
    recentEvents >= 3 && recentEvents >= 2.0 * baselineRatePerHour * recentHours
}
