package graft

import graft.ingest.SilverTables
import org.apache.spark.sql.functions._

class SilverTablesSpec extends SparkSpec {

  test("performance_trends: structure + drift + fragment-robust consistency") {
    import spark.implicits._
    // activity 1: interval session; activity 2: steady with a GPS fragment
    val splits = Seq(
      (1L, 1, "WARMUP", 1000.0, 400.0, 130.0),
      (1L, 2, "INTERVAL", 1000.0, 300.0, 160.0),
      (1L, 3, "RECOVERY", 1000.0, 550.0, 135.0),
      (1L, 4, "INTERVAL", 1000.0, 300.0, 170.0),
      (1L, 5, "RECOVERY", 1000.0, 550.0, 138.0),
      (2L, 1, "ACTIVE", 1000.0, 400.0, 140.0),
      (2L, 2, "ACTIVE", 1000.0, 404.0, 141.0),
      (2L, 3, "ACTIVE", 1000.0, 396.0, 149.0),
      (2L, 4, "ACTIVE", 120.0, 420.0, 150.0)) // GPS fragment: dist << median
      .toDF("activity_id", "split_index", "intensity_type", "distance",
        "pace_seconds_per_km", "heart_rate")
    val pt = SilverTables.performanceTrends(spark, splits)
      .collect().map(r => r.getAs[Long]("activity_id") -> r).toMap
    assert(pt(1L).getAs[String]("workout_structure") === "interval")
    assert(pt(2L).getAs[String]("workout_structure") === "steady")
    // interval drift: INTERVAL reps 160 -> 170 at held pace => positive
    assert(pt(1L).getAs[Double]("hr_drift_percentage") > 0)
    // schema conformance: exact silver contract
    // nullability is data-dependent; the contract is names + types
    assert(SilverTables.performanceTrends(spark, splits).schema
      .map(f => (f.name, f.dataType))
      === Schemas.performanceTrends.map(f => (f.name, f.dataType)))
    // robust CV excludes the fragment, full CV includes it
    val robust = pt(2L).getAs[Double]("pace_consistency")
    val full = pt(2L).getAs[Double]("pace_consistency_full")
    assert(robust > 0 && full > 0 && robust != full)
  }

  test("hr_efficiency: pcts sum to 100, Zone3-dominant easy refines to moderate") {
    import spark.implicits._
    val zones = Seq(
      // activity 1: controlled moderate (Zone3 60%, z4+5 10%)
      (1L, 1, 97.0, 60.0), (1L, 2, 117.0, 240.0), (1L, 3, 137.0, 600.0),
      (1L, 4, 157.0, 80.0), (1L, 5, 176.0, 20.0),
      // activity 2: genuine easy (Zone2 dominant)
      (2L, 1, 97.0, 200.0), (2L, 2, 117.0, 700.0), (2L, 3, 137.0, 100.0),
      (2L, 4, 157.0, 0.0), (2L, 5, 176.0, 0.0))
      .toDF("activity_id", "zone_number", "lower_bpm", "secs_in_zone")
    val acts = Seq((1L, "aerobic_base"), (2L, "aerobic_base"))
      .toDF("activity_id", "training_type")
    val he = SilverTables.hrEfficiency(zones, acts)
      .collect().map(r => r.getAs[Long]("activity_id") -> r).toMap
    assert(he(1L).getAs[String]("intensity_category") === "moderate")
    assert(he(2L).getAs[String]("intensity_category") === "easy")
    val total = Seq("zone1_pct", "zone2_pct", "zone3_pct", "zone4_pct", "zone5_pct")
      .map(he(1L).getAs[Double]).sum
    assert(math.abs(total - 100.0) < 0.05)
  }

  test("Schemas.conform: missing columns become typed nulls, extras dropped") {
    import spark.implicits._
    val df = Seq((1L, "x", 99)).toDF("activity_id", "stray_col", "readiness")
    val out = Schemas.conform(df, "vo2_max")
    assert(out.schema.map(f => (f.name, f.dataType))
      === Schemas.vo2Max.map(f => (f.name, f.dataType)))
    val row = out.first()
    assert(row.getAs[Long]("activity_id") === 1L)
    assert(row.isNullAt(out.schema.fieldIndex("precise_value")))
    intercept[IllegalArgumentException] { Schemas.conform(df, "nope") }
  }

  test("form_evaluations: column-math scoring matches the scalar scorer") {
    import spark.implicits._
    import graft.domain.FormBaseline
    val gct = FormBaseline.GctPowerModel(5.9, -0.8, 0.0, 60)
    val vo = FormBaseline.LinearModel(7.0, 0.9, 0.0, 50)
    val vr = FormBaseline.LinearModel(9.0, -0.5, 0.0, 50)
    val obs = Seq((10L, 250.0, 230.0, 11.0, 7.5))
      .toDF("activity_id", "pace_seconds_per_km", "gct_ms", "vo_cm", "vr_pct")
    val row = SilverTables.formEvaluations(obs, gct, vo, vr,
      java.sql.Timestamp.valueOf("2026-08-01 00:00:00")).first()
    // recompute with the scalar domain scorer
    val speed = 1000.0 / 250.0
    val gctExp = gct.predictInverse(speed)
    val voExp = vo.predict(speed)
    val vrExp = vr.predict(speed)
    val gd = (230.0 - gctExp) / gctExp * 100
    val vd = (11.0 - voExp) / voExp * 100
    val rd = (7.5 - vrExp) / vrExp * 100
    val expected = FormBaseline.score(gd, vd, rd)
    assert(math.abs(row.getAs[Float]("score") - expected.score) < 1e-4)
    assert(row.getAs[Boolean]("vo_needs_improvement") === expected.voNeedsImprovement)
    assert(math.abs(row.getAs[Float]("gct_penalty") - expected.gctPenalty) < 1e-4)
  }
}
