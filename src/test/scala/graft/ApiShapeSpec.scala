package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.types.StructType

/** Golden output-shape snapshot for the api.Graft facade — the analog of
  * the reference's tests/snapshots/all_domains_output_shape.json +
  * test_output_shape_snapshot.py: ONE committed JSON of
  * (tool method → column name : type : nullability) covering every
  * facade entry point, with a drift test. A facade method silently
  * changing a column name, type, or nullability is an API break for
  * every downstream consumer even when the values stay right — exactly
  * the class of regression the per-method piecemeal asserts in ApiSpec
  * could miss.
  *
  * Re-record an INTENTIONAL shape change with
  *   API_SHAPE_RECORD=1 sbt "testOnly graft.ApiShapeSpec"
  * and commit the snapshot diff (same discipline as shuffle_budget.tsv).
  *
  * DataFrame tools are snapshotted from the PLAN schema (nothing
  * executes); scalar tools record their Scala result type; case-class
  * tools record the class's Encoder schema, so a field rename/retype in
  * the domain layer trips the same net.
  */
class ApiShapeSpec extends SparkSpec {

  private lazy val g: graft.api.Graft = {
    // the review/goal tables are written by athlete.save* in normal use;
    // materialize empty conformed copies so the read-side tools resolve
    // regardless of which spec ran first
    val root = ApiFixture.root
    Seq("weekly_reviews" -> graft.Schemas.all("weekly_reviews"),
        "athlete_goals" -> graft.Schemas.all("athlete_goals")).foreach {
      case (t, schema) =>
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/$t")))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
            .write.mode("ignore").parquet(s"$root/$t")
    }
    new graft.api.Graft(spark, root)
  }

  private def render(st: StructType): Seq[String] =
    st.fields.toSeq.map(f =>
      s"${f.name}:${f.dataType.simpleString}:${if (f.nullable) "null" else "req"}")

  private def df(d: DataFrame): Seq[String] = render(d.schema)
  private def cc[T <: Product : scala.reflect.runtime.universe.TypeTag](
      tag: String): Seq[String] = s"($tag)" +: render(Encoders.product[T].schema)
  private def scalar(t: String): Seq[String] = Seq(s"-> $t")

  /** The full tool surface: every public facade entry point, fixture args. */
  private lazy val surface: Seq[(String, Seq[String])] = {
    val w = Seq("2026-06-01", "2026-06-30")
    Seq(
      "bulkActivityFields" -> df(g.bulkActivityFields(Seq(1L), Seq("activity_date"))),
      "selectFields" -> df(g.selectFields("activities", Seq("activity_id", "activity_date"))),
      "weekStartDay" -> scalar("int"),
      "export" -> scalar("long (rows written)"),
      // splits tools: row mode and the statistics_only aggregate mode
      // are DIFFERENT output contracts — snapshot both
      "splits.paceHr" -> df(g.splits.paceHr(100L)),
      "splits.paceHr#stats" -> df(g.splits.paceHr(100L, statisticsOnly = true)),
      "splits.formMetrics" -> df(g.splits.formMetrics(100L)),
      "splits.formMetrics#stats" -> df(g.splits.formMetrics(100L, statisticsOnly = true)),
      "splits.elevation" -> df(g.splits.elevation(100L)),
      "splits.elevation#stats" -> df(g.splits.elevation(100L, statisticsOnly = true)),
      "splits.comprehensive" -> df(g.splits.comprehensive(100L)),
      "splits.comprehensive#stats" -> df(g.splits.comprehensive(100L, statisticsOnly = true)),
      "splits.intervalAnalysis" -> cc[graft.domain.Performance.Segment]("Seq[Performance.Segment]"),
      "trainingLoad.acwr" -> df(g.trainingLoad.acwr()),
      "trainingLoad.injuryRisk" -> cc[graft.domain.InjuryRisk.Assessment]("Option[InjuryRisk.Assessment]"),
      "physiology.recoveryStatus" -> scalar("string (recovery class)"),
      "physiology.wellnessDeviation" -> cc[graft.domain.Wellness.MetricBaseline]("Wellness.MetricBaseline"),
      "fitness.currentFitnessSummary" -> cc[graft.domain.FitnessAssessor.Assessment]("FitnessAssessor.Assessment"),
      "fitness.raceReadiness" -> cc[graft.domain.RacePrediction.Prediction]("Map[String, RacePrediction.Prediction]"),
      "fitness.goalProgress.goal" -> cc[graft.domain.RaceGoal.Goal]("RaceGoal.Goal"),
      "fitness.goalProgress.progress" -> cc[graft.domain.RaceGoal.Progress]("RaceGoal.Progress"),
      "trends.weeklyVolume" -> df(g.trends.weeklyVolume()),
      "trends.monthlyVolume" -> df(g.trends.monthlyVolume()),
      "comparisons.findSimilarWorkouts" -> df(g.comparisons.findSimilarWorkouts(15L)),
      "durability.activityDurability" -> df(g.durability.activityDurability(1L)),
      "durability.longRuns" -> df(g.durability.longRuns(w(0), w(1))),
      "durability.durabilityTrend" -> df(g.durability.durabilityTrend(w(0), w(1))),
      "heat.heatTrend" -> df(g.heat.heatTrend(w(0), w(1))),
      "heat.heatCostPoints" -> df(g.heat.heatCostPoints(w(0), w(1))),
      "timeSeries.formAnomalySummary" -> df(g.timeSeries.formAnomalySummary()),
      "timeSeries.timeRangeStats" -> df(g.timeSeries.timeRangeStats(1L, 0, 30, "heart_rate")),
      "athlete.latestReviews" -> df(g.athlete.latestReviews())) ++
    // behavioral tier (events table)
    Seq[(String, DataFrame)](
      "events.userFeatures" -> g.events.userFeatures(sfDir),
      "events.funnel" -> g.events.funnel(sfDir),
      "events.retentionCohorts" -> g.events.retentionCohorts(sfDir),
      "events.transitions" -> g.events.transitions(sfDir),
      "events.ewma" -> g.events.ewma(sfDir),
      "events.pivotCounts" -> g.events.pivotCounts(sfDir),
      "events.rollingActives" -> g.events.rollingActives(sfDir),
      "events.newVsReturning" -> g.events.newVsReturning(sfDir),
      "events.percentiles" -> g.events.percentiles(sfDir),
      "events.attribution" -> g.events.attribution(sfDir),
      "events.activeDays" -> g.events.activeDays(sfDir),
      "events.churnRate" -> g.events.churnRate(sfDir),
      "events.userGrowth" -> g.events.userGrowth(sfDir)
    ).map { case (n, d) => n -> df(d) } ++
    // training-data pipeline tier (documents/embeddings corpus)
    Seq[(String, DataFrame)](
      "pipeline.curationStatuses" -> g.pipeline.curationStatuses(sfDir),
      "pipeline.curated" -> g.pipeline.curated(sfDir),
      "pipeline.dupClusters" -> g.pipeline.dupClusters(sfDir),
      "pipeline.stratifiedSample" -> g.pipeline.stratifiedSample(sfDir),
      "pipeline.mixtureSample" -> g.pipeline.mixtureSample(sfDir),
      "pipeline.bm25" -> g.pipeline.bm25(sfDir),
      "pipeline.lmScores" -> g.pipeline.lmScores(sfDir),
      "pipeline.lmScoresTopK" -> g.pipeline.lmScoresTopK(sfDir),
      "pipeline.nearDupPairsCapped" -> g.pipeline.nearDupPairsCapped(sfDir),
      "pipeline.semanticDedup" -> g.pipeline.semanticDedup(sfDir),
      "pipeline.budgetSelect" -> g.pipeline.budgetSelect(sfDir),
      "pipeline.dsirWeights" -> g.pipeline.dsirWeights(sfDir),
      "pipeline.annSearch" -> g.pipeline.annSearch(sfDir),
      "pipeline.annRerank" -> g.pipeline.annRerank(sfDir),
      "pipeline.splitAssignments" -> g.pipeline.splitAssignments(sfDir),
      "pipeline.vocabulary" -> g.pipeline.vocabulary(sfDir),
      "pipeline.oovRates" -> g.pipeline.oovRates(sfDir),
      "pipeline.sourceDrift" -> g.pipeline.sourceDrift(sfDir),
      "pipeline.sourceOverlap" -> g.pipeline.sourceOverlap(sfDir),
      "pipeline.temperatureMixture" -> g.pipeline.temperatureMixture(sfDir),
      "pipeline.phraseSearch" -> g.pipeline.phraseSearch(sfDir),
      "pipeline.classifierScores" -> g.pipeline.classifierScores(sfDir),
      "pipeline.sourceCap" -> g.pipeline.sourceCap(sfDir),
      "pipeline.hardNegatives" -> g.pipeline.hardNegatives(sfDir),
      "pipeline.labelScatter" -> g.pipeline.labelScatter(sfDir),
      "pipeline.dedupSurvivors" -> g.pipeline.dedupSurvivors(sfDir),
      "pipeline.curriculumTiers" -> g.pipeline.curriculumTiers(sfDir),
      "pipeline.minhashCalibration" -> g.pipeline.minhashCalibration(sfDir),
      "pipeline.minhashSweep" -> g.pipeline.minhashSweep(sfDir),
      "pipeline.ivfRecall" -> g.pipeline.ivfRecall(sfDir),
      "pipeline.novelty" -> g.pipeline.novelty(sfDir),
      "pipeline.sourceDupRate" -> g.pipeline.sourceDupRate(sfDir),
      "pipeline.tfidfTerms" -> g.pipeline.tfidfTerms(sfDir),
      "pipeline.docChunks" -> g.pipeline.docChunks(sfDir),
      "pipeline.hybridRank" -> g.pipeline.hybridRank(sfDir),
      "pipeline.fuzzyPairs" -> g.pipeline.fuzzyPairs(sfDir),
      "pipeline.annRecall" -> g.pipeline.annRecall(sfDir),
      "pipeline.dupPageRank" -> g.pipeline.dupPageRank(sfDir),
      "pipeline.annNdcg" -> g.pipeline.annNdcg(sfDir),
      "pipeline.clusterPurity" -> g.pipeline.clusterPurity(sfDir)
    ).map { case (n, d) => n -> df(d) }
  }

  test("facade output shapes match the committed golden snapshot") {
    val rendered = surface.sortBy(_._1).map { case (name, fields) =>
      "  \"" + name + "\": [" +
        fields.map(f => "\"" + f + "\"").mkString(", ") + "]"
    }.mkString("{\n", ",\n", "\n}\n")
    val path = java.nio.file.Paths.get(
      "src/test/resources/api_shape_snapshot.json")
    if (!java.nio.file.Files.exists(path) ||
        sys.env.contains("API_SHAPE_RECORD")) {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, rendered)
      fail(s"api shape snapshot (re)recorded to $path — review and commit")
    }
    val want = java.nio.file.Files.readString(path)
    if (want != rendered) {
      // precise drift message: first differing method
      val wantLines = want.linesIterator.toSeq
      val gotLines = rendered.linesIterator.toSeq
      val diff = wantLines.zipAll(gotLines, "<missing>", "<missing>")
        .find { case (a, b) => a != b }
      fail("facade output shape drift vs api_shape_snapshot.json — " +
        s"first diff:\n  snapshot: ${diff.map(_._1).getOrElse("")}\n  " +
        s"current:  ${diff.map(_._2).getOrElse("")}\n(if intentional, " +
        "re-record with API_SHAPE_RECORD=1 and commit)")
    }
    // the snapshot must keep covering the whole surface: 84 entries today
    assert(surface.size >= 84, s"facade surface shrank: ${surface.size}")
  }
}
