package graft

import java.nio.file.Files
import graft.api.Graft
import org.apache.spark.sql.functions._

/** Facade over a miniature silver root — tool-shaped entry points stay
  * thin wrappers over the operator/domain modules.
  */
class ApiSpec extends SparkSpec {

  private def root: String = ApiFixture.root
  private lazy val g = new Graft(spark, root)

  test("splits groups: rows mode ordered, statistics_only aggregates to one row") {
    assert(g.splits.paceHr(100L).count() === 5)
    val stats = g.splits.paceHr(100L, statisticsOnly = true).collect()
    assert(stats.length === 1) // the ~80% output-reduction contract
    assert(stats.head.getAs[Long]("n_rows") === 5L)
  }

  test("interval analysis end-to-end through the facade") {
    val segs = g.splits.intervalAnalysis(100L)
    assert(segs.map(_.segmentType) ===
      Seq("warmup", "work", "recovery", "work", "cooldown"))
    val fatigue = graft.domain.Performance.detectFatigue(segs)
    assert(fatigue.hrIncreaseBpm === 7.0) // 172 - 165
    val rate = graft.domain.Performance.recoveryRate(segs(1), segs(2))
    assert(rate.exists(r => math.abs(r - (165.0 - 140.0) / (510.0 / 60)) < 1e-9))
  }

  test("acwr over the daily-load frame classifies steady load as optimal") {
    val last = g.trainingLoad.acwr().orderBy(desc("activity_date")).first()
    assert(last.getAs[String]("zone") === "optimal")
  }

  test("recovery status: two HRV nights below baseline forces easy") {
    assert(g.physiology.recoveryStatus() === "easy") // readiness 60 would be moderate
  }

  test("wellness deviation flags today's HRV collapse as adverse") {
    val mb = g.physiology.wellnessDeviation("hrv_overnight", "low_is_bad")
    assert(mb.flag === "low" && mb.adverse)
  }

  test("race readiness produces blended predictions for standard distances") {
    val preds = g.fitness.raceReadiness(50.0, Seq((5.0, 1205L), (10.0, 2500L)))
    assert(preds.keySet === Set("race_5k", "race_10k", "half", "full"))
    assert(preds("race_5k").confidence === "high") // vdot 50 5k ~ 1200s, curve 1205
  }

  test("export via facade enforces the cap") {
    val out = Files.createTempDirectory("graft-api-exp").toString
    assert(g.export(g.table("splits"), s"$out/x", "csv") === 5L)
    intercept[IllegalArgumentException] {
      g.export(g.table("splits"), s"$out/y", "csv", maxRows = 2)
    }
  }

  test("column allowlist: contract columns pass, anything else rejects") {
    val ok = g.selectFields("activities",
      Seq("activity_id", "activity_date", "total_distance_km"))
    assert(ok.columns.toSeq ===
      Seq("activity_id", "activity_date", "total_distance_km"))
    val e = intercept[IllegalArgumentException] {
      g.selectFields("activities", Seq("activity_date; DROP TABLE x"))
    }
    assert(e.getMessage.contains("allowlist"))
    intercept[IllegalArgumentException] {
      g.selectFields("no_such_table", Seq("a"))
    }
    val bulk = g.bulkActivityFields(Seq(1L, 2L),
      Seq("avg_heart_rate", "total_distance_km")).collect()
    assert(bulk.length === 2)
  }

  test("weekly volume honours the profile's Sunday week start") {
    assert(g.weekStartDay() === 6)
    val weeks = g.trends.weeklyVolume().collect()
    // every bucket start is a Sunday
    weeks.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(d.getDayOfWeek === java.time.DayOfWeek.SUNDAY, d)
    }
    assert(weeks.map(_.getAs[Double]("load_km")).sum === 304.0) // 29*10 + 14
  }

  test("athlete round trips: profile upsert, review revisions, goal feed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // profile upsert replaces only the target user's row
    g.athlete.saveProfile(Seq(("u9", "base", 3)).toDF(
      "user_id", "current_focus", "week_start_day"))
    g.athlete.saveProfile(Seq(("u9", "marathon", 0)).toDF(
      "user_id", "current_focus", "week_start_day"))
    val p = g.athlete.profile("u9").get
    assert(p.getAs[String]("current_focus") === "marathon")
    assert(g.table("athlete_profile").where("user_id = 'u9'").count() === 1)
    // append-only reviews, latest revision wins per week
    def review(id: Int, data: String, at: String) = Seq((id, data)).toDF(
      "review_id", "review_data")
      .withColumn("user_id", lit("u9"))
      .withColumn("week_start_date", lit(java.sql.Date.valueOf("2026-08-03")))
      .withColumn("created_at", lit(java.sql.Timestamp.valueOf(at)))
    g.athlete.saveWeeklyReview(review(1, "v1", "2026-08-09 10:00:00"))
    g.athlete.saveWeeklyReview(review(2, "v2", "2026-08-10 10:00:00"))
    val latest = g.athlete.latestReviews()
      .where("week_start_date = DATE '2026-08-03'").collect()
    assert(latest.length === 1)
    assert(latest.head.getAs[String]("review_data") === "v2")
    // registered goal feeds goal progress
    g.athlete.saveGoal(Seq((1, "u9", "city 10k", 10.0, 2400)).toDF(
      "goal_id", "user_id", "race_name", "distance_km", "target_time_seconds")
      .withColumn("race_date", lit(java.sql.Date.valueOf("2026-10-01")))
      .withColumn("priority", lit("A"))
      .withColumn("status", lit("active")))
    val gp = g.fitness.goalProgress(50.0,
      java.time.LocalDate.of(2026, 8, 12), "u9")
    assert(gp.exists(_._1.raceName.contains("city 10k")))
    assert(gp.flatMap(_._2).exists(_.weeksRemaining.contains(7)))
  }

  test("pipeline facade: curated corpus = kept statuses, clusters resolve") {
    val g = new graft.api.Graft(spark, sfDir)
    val statuses = g.pipeline.curationStatuses(sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val kept = g.pipeline.curated(sfDir).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept === statuses.filter(_._2 == "kept").keySet)
    val clusters = g.pipeline.dupClusters(sfDir).collect()
    assert(clusters.nonEmpty)
    // every non-canonical member was excluded from the curated corpus
    clusters.filter(r => !r.getBoolean(3)).foreach { r =>
      assert(!kept.contains(r.getLong(0)), s"near-dup ${r.getLong(0)} kept")
    }
    assert(g.pipeline.mixtureSample(sfDir).count() === 50) // 25+15+10
  }

  test("pipeline facade: round-5 additions route to their registered queries") {
    val g = new graft.api.Graft(spark, sfDir)
    // each facade method must return the same frame its query registers
    val pairs = Seq(
      g.pipeline.classifierScores(sfDir) -> "q_text_clf_score",
      g.pipeline.sourceCap(sfDir) -> "q_source_cap",
      g.pipeline.hardNegatives(sfDir) -> "q_hard_negatives",
      g.pipeline.labelScatter(sfDir) -> "q_label_scatter",
      g.pipeline.dedupSurvivors(sfDir) -> "q_dedup_survivor",
      g.pipeline.curriculumTiers(sfDir) -> "q_curriculum",
      g.pipeline.minhashCalibration(sfDir) -> "q_minhash_calibration",
      g.pipeline.phraseSearch(sfDir) -> "q_phrase_search",
      g.pipeline.docChunks(sfDir) -> "q_doc_chunks",
      g.pipeline.hybridRank(sfDir) -> "q_hybrid_rank",
      g.pipeline.fuzzyPairs(sfDir) -> "q_fuzzy_pairs",
      g.events.userFeatures(sfDir) -> "q_user_features",
      g.events.funnel(sfDir) -> "q_event_funnel",
      g.events.retentionCohorts(sfDir) -> "q_retention_cohorts",
      g.events.transitions(sfDir) -> "q_event_transitions",
      g.events.ewma(sfDir) -> "q_ewma",
      g.events.pivotCounts(sfDir) -> "q_event_pivot",
      g.events.rollingActives(sfDir) -> "q_rolling_actives",
      g.events.newVsReturning(sfDir) -> "q_new_vs_returning",
      g.events.percentiles(sfDir) -> "q_percentiles",
      g.events.attribution(sfDir) -> "q_attribution",
      g.events.activeDays(sfDir) -> "q_active_days",
      g.events.churnRate(sfDir) -> "q_churn_rate",
      g.events.userGrowth(sfDir) -> "q_user_growth",
      g.pipeline.annRecall(sfDir) -> "q_ann_recall",
      g.pipeline.annNdcg(sfDir) -> "q_ann_ndcg",
      g.pipeline.clusterPurity(sfDir) -> "q_cluster_purity",
      g.pipeline.minhashSweep(sfDir) -> "q_minhash_sweep",
      g.pipeline.ivfRecall(sfDir) -> "q_ivf_recall",
      g.pipeline.novelty(sfDir) -> "q_novelty",
      g.pipeline.sourceDupRate(sfDir) -> "q_source_dup_rate",
      g.pipeline.tfidfTerms(sfDir) -> "q_tfidf_terms",
      g.pipeline.dupPageRank(sfDir) -> "q_pagerank",
      g.pipeline.annRerank(sfDir) -> "q_ann_rerank")
    pairs.foreach { case (df, name) =>
      val direct = SparkEntry.queries(name)(spark, sfDir)
      assert(df.columns.toSeq === direct.columns.toSeq, name)
      assert(df.count() === direct.count(), name)
    }
  }

  test("heat cost points honour the insufficient_data gate; long runs default to 10 km") {
    // full window: acts 1-12 carry a temperature average -> 12 observations,
    // above the reference's MIN_FIT_ACTIVITIES=10 -> one point per run
    assert(g.heat.heatCostPoints("2026-06-01", "2026-06-30").count() === 12)
    // narrow window: only acts 1-8 -> 8 observations; the reference returns
    // insufficient_data (no points), so the frame must be empty
    assert(g.heat.heatCostPoints("2026-06-01", "2026-06-08").count() === 0)
    // default long-run threshold is the reference's 10.0 km: the 10 km runs
    // with usable time-series spans (acts 1-3) all qualify; under the old
    // 15.0 default even the 14 km outlier was excluded
    val runs = g.durability.longRuns("2026-06-01", "2026-06-30")
    assert(runs.select("activity_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L))
  }

  test("find similar workouts: band, score, interpretation") {
    val rows = g.comparisons.findSimilarWorkouts(10L, paceTolerance = 0.05,
      distanceTolerance = 0.05).collect()
    assert(rows.nonEmpty)
    // the outlier run 15 (14 km, much faster) is outside the 5% band
    assert(!rows.map(_.getAs[Long]("activity_id")).contains(15L))
    rows.foreach { r =>
      val s = r.getAs[Double]("similarity_score")
      assert(s >= 0.0 && s <= 100.0)
      val interp = r.getAs[String]("interpretation")
      assert(interp.startsWith("ペース: ") && interp.contains("心拍: "))
      assert(!interp.contains("気温")) // no temperature source -> no context
    }
  }
}
