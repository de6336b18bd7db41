package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing text layers (VERDICT r1 next-round #10): Japanese form-anomaly
  * recommendations (reference rag/queries/form_anomaly_detector.py:49-115),
  * trend-headline fusion flags (analysis/derivations.py:384-515), and the
  * warmup/run/recovery/cooldown phase evaluation strings
  * (inserters/performance_trends.py:362-447). All byte-exact `when` chains —
  * no UDFs, everything stays inside codegen.
  */
object Labels {

  // ------------------------------------------------ anomaly recommendations

  /** METRIC_LABELS (form_anomaly_detector.py:49-53). */
  val MetricLabels: Map[String, String] = Map(
    "directGroundContactTime" -> "接地時間(GCT)",
    "directVerticalOscillation" -> "上下動(VO)",
    "directVerticalRatio" -> "上下動比(VR)")

  /** cause -> template, in the reference's fixed emission order
    * (form_anomaly_detector.py:100-105). `{label}` is replaced by the
    * dominant metric's label.
    */
  val CauseTemplates: Seq[(String, String)] = Seq(
    "elevation_change" -> "上り坂で{label}悪化 → 上り坂練習を強化",
    "pace_change" -> "ペース変化時に{label}が増加 → ペース変化を緩やかに",
    "fatigue" -> "後半に{label}悪化（疲労傾向）→ 持久力トレーニング強化")

  /** One recommendation per identifiable cause, naming the dominant (most
    * frequent) metric for that cause (form_anomaly_detector.py:76-115).
    * `isolated` anomalies emit nothing. Ties on the count resolve to the
    * earliest-seen metric (the reference's Counter keeps insertion order;
    * anomalies arrive in time order) then lexicographically.
    *
    * Input: the [[FormAnomaly.detect]] output (metric, probable_cause, ts).
    * Output: (cause_order, probable_cause, recommendation), one row per
    * cause present, ordered like the reference's list.
    */
  def recommendations(anomalies: DataFrame): DataFrame = {
    val causeOrder = CauseTemplates.map(_._1).zipWithIndex.toMap
    val templates = typedLit(CauseTemplates.toMap)
    val labels = typedLit(MetricLabels)
    val counts = anomalies
      .where(col("probable_cause").isin(CauseTemplates.map(_._1): _*))
      .groupBy("probable_cause", "metric")
      .agg(count(lit(1)).as("cnt"), min("ts").as("first_ts"))
    val w = Window.partitionBy("probable_cause")
      .orderBy(col("cnt").desc, col("first_ts").asc, col("metric").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(
        element_at(typedLit(causeOrder), col("probable_cause"))
          .as("cause_order"),
        col("probable_cause"),
        regexp_replace(
          element_at(templates, col("probable_cause")),
          lit("\\{label\\}"),
          coalesce(element_at(labels, col("metric")), col("metric")))
          .as("recommendation"))
      .orderBy("cause_order")
  }

  // Python "%.1f"/"%.0f" half-even: bround first, then Java-format.
  private def fmt1(c: Column): Column = format_string("%.1f", bround(c, 1))
  private def fmt0(c: Column): Column = format_string("%.0f", bround(c, 0))

  /** Comparison interpretation (comparisons.py:455-486): pace / HR deltas in
    * Japanese, with the temperature context appended to the HR clause when
    * the difference exceeds 1 °C. Byte-exact: "ペース: 3.2秒/km速い, 心拍:
    * 12bpm高い（気温+6°C影響）".
    */
  def comparisonInterpretation(paceDiff: Column, hrDiff: Column,
      tempDiff: Column): Column = {
    val paceTxt = concat(fmt1(abs(paceDiff)), lit("秒/km"),
      when(paceDiff < 0, "速い").otherwise("遅い"))
    val hrBase = concat(fmt0(abs(hrDiff)), lit("bpm"),
      when(hrDiff < 0, "低い").otherwise("高い"))
    val tempTxt = when(tempDiff.isNotNull && abs(tempDiff) > 1.0,
      concat(lit("（気温"), when(tempDiff > 0, "+").otherwise(""),
        fmt0(tempDiff), lit("°C影響）"))).otherwise(lit(""))
    concat(lit("ペース: "), paceTxt, lit(", 心拍: "), hrBase, tempTxt)
  }

  // ------------------------------------------------------- trend headline

  /** Percentage change from prior to current, rounded to 1 dp half-even
    * (derivations.py:393-407): null when either operand is null or prior
    * is 0. Spark's `bround` is banker's rounding — matching Python round().
    */
  def periodDeltaPct(current: Column, prior: Column): Column =
    when(current.isNull || prior.isNull || prior === 0.0,
      lit(null).cast("double"))
      .otherwise(bround((current - prior) / prior * 100.0, 1))

  /** Trailing week-over-week build streak (derivations.py:410-431) as a
    * column aggregate over a per-key ordered weekly-load frame: the final
    * week always counts; the streak extends while each prior week is
    * STRICTLY below the next. Implemented as the classic lag + reset-flag +
    * cumsum — one window chain, no sequential scan.
    *
    * Input columns: key, weekIdx (orderable), load. Output: (key,
    * build_weeks).
    */
  def buildWeeks(weekly: DataFrame, keyCol: String, weekCol: String,
      loadCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(weekCol))
    val flagged = weekly
      .withColumn("_prev", lag(col(loadCol), 1).over(byKey))
      // a week breaks the streak when its prior week did NOT increase
      .withColumn("_brk",
        when(col("_prev").isNull || col("_prev") >= col(loadCol), 1)
          .otherwise(0))
      .withColumn("_grp", sum(col("_brk")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // the streak ending at the LAST week = size of the last _grp run
    val lastGrp = flagged
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(weekCol).desc)))
    lastGrp.where(col("_rk") === 1)
      .select(col(keyCol), col("_grp").as("_last_grp"))
      .join(flagged, keyCol)
      .where(col("_grp") === col("_last_grp"))
      .groupBy(keyCol)
      .agg(count(lit(1)).cast("int").as("build_weeks"))
  }

  private val HighLoadAcwr = Seq("caution", "high_risk")
  private val UnderRecoveryState = "under_recovery"
  val FormDeclinePctThreshold: Double = -2.0

  /** Cross-signal warning flags (derivations.py:434-464): every output is a
    * non-null boolean; healthy signals yield all false.
    */
  def fusionFlags(acwrStatus: Column, hrvState: Column,
      formDeltaPct: Column): Column = {
    val highLoad = coalesce(acwrStatus.isin(HighLoadAcwr: _*), lit(false))
    val underRec = coalesce(hrvState === UnderRecoveryState, lit(false))
    val formDecl = formDeltaPct.isNotNull &&
      formDeltaPct <= FormDeclinePctThreshold
    struct(
      (highLoad && underRec).as("high_load_low_recovery"),
      (highLoad && formDecl).as("high_load_form_decline"),
      (underRec && formDecl).as("under_recovery_form_decline"))
  }

  /** Headline metrics for the trend narration (derivations.py:467-515):
    * last-vs-prior weekly load delta, trailing build streak, fusion flags.
    * Input: per-key weekly loads (key, weekIdx, load) + per-key signal
    * frame (key, acwr_status, hrv_state, form_delta_pct).
    */
  def trendHeadline(weekly: DataFrame, signals: DataFrame, keyCol: String,
      weekCol: String, loadCol: String): DataFrame = {
    val byKeyDesc = Window.partitionBy(col(keyCol)).orderBy(col(weekCol).desc)
    val lastTwo = weekly
      .withColumn("_rk", row_number().over(byKeyDesc))
      .where(col("_rk") <= 2)
      .groupBy(keyCol)
      .agg(
        max(when(col("_rk") === 1, col(loadCol))).as("_cur"),
        max(when(col("_rk") === 2, col(loadCol))).as("_pri"),
        count(lit(1)).as("_n"))
      .select(col(keyCol),
        when(col("_n") >= 2, periodDeltaPct(col("_cur"), col("_pri")))
          .as("load_delta_pct"))
    lastTwo
      .join(buildWeeks(weekly, keyCol, weekCol, loadCol), Seq(keyCol), "left")
      .join(signals, Seq(keyCol), "left")
      .select(col(keyCol), col("load_delta_pct"), col("build_weeks"),
        fusionFlags(col("acwr_status"), col("hrv_state"),
          col("form_delta_pct")).as("fusion_flags"))
  }

  // ---------------------------------------------------- phase evaluations

  // Python truthiness: a stats value participates only when non-null AND
  // non-zero (performance_trends.py reads avg_hr/avg_pace with `if hr and
  // pace:`).
  private def truthy(c: Column): Column = c.isNotNull && c =!= 0.0

  /** Warmup evaluation (performance_trends.py:363-379): "No warmup" without
    * a warmup phase; "Good warmup" below 140 bpm; otherwise
    * "Minimal warmup" (the 140–150 and 150+ branches emit the same string).
    */
  def warmupEvaluation(hasPhase: Column, avgHr: Column,
      avgPace: Column): Column =
    when(!hasPhase, "No warmup")
      .when(truthy(avgHr) && truthy(avgPace) && avgHr < 140.0, "Good warmup")
      .otherwise("Minimal warmup")

  /** Run evaluation (performance_trends.py:381-402): "Poor" without a run
    * phase; with usable hr+pace, CV < 0.05 → "Excellent" at HR ≥ 145 else
    * "Good"; CV < 0.10 → "Good"; otherwise (incl. null CV) "Fair".
    */
  def runEvaluation(hasPhase: Column, avgHr: Column, avgPace: Column,
      paceConsistency: Column): Column =
    when(!hasPhase, "Poor")
      .when(!(truthy(avgHr) && truthy(avgPace)), "Fair")
      .when(paceConsistency.isNotNull && paceConsistency < 0.05,
        when(avgHr >= 145.0, "Excellent").otherwise("Good"))
      .when(paceConsistency.isNotNull && paceConsistency < 0.10, "Good")
      .otherwise("Fair")

  /** Recovery evaluation (performance_trends.py:404-429): "No recovery"
    * without a recovery phase; HR drop ≥ 10 AND cadence drop ≥ 10 →
    * "Excellent recovery"; HR drop ≥ 5 → "Good recovery"; else
    * "Insufficient recovery" (also when HR is unusable or there is no run
    * phase to compare against).
    */
  def recoveryEvaluation(hasRecovery: Column, hasRun: Column,
      recoveryHr: Column, recoveryCadence: Column, runHr: Column,
      runCadence: Column): Column = {
    val hrDrop = runHr - recoveryHr
    val cadenceDrop =
      when(truthy(recoveryCadence) && truthy(runCadence),
        runCadence - recoveryCadence).otherwise(lit(0.0))
    when(!hasRecovery, "No recovery")
      .when(!hasRun, "Insufficient recovery")
      .when(!(truthy(recoveryHr) && truthy(runHr)), "Insufficient recovery")
      .when(hrDrop >= 10.0 && cadenceDrop >= 10.0, "Excellent recovery")
      .when(hrDrop >= 5.0, "Good recovery")
      .otherwise("Insufficient recovery")
  }

  /** Cooldown evaluation (performance_trends.py:431-447): mirror of the
    * warmup rule with the cooldown strings.
    */
  def cooldownEvaluation(hasPhase: Column, avgHr: Column,
      avgPace: Column): Column =
    when(!hasPhase, "No cooldown")
      .when(truthy(avgHr) && truthy(avgPace) && avgHr < 140.0, "Good cooldown")
      .otherwise("Minimal cooldown")
}
