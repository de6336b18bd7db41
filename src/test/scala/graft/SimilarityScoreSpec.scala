package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** Weighted workout-similarity scoring (reference comparisons.py:39-104 the
  * intensity matrix, :415-453 the weighted score).
  */
class SimilarityScoreSpec extends SparkSpec {
  import spark.implicits._

  test("intensity matrix pins the reference values, symmetric, default 0.3") {
    val df = Seq(
      ("tempo", "lactate_threshold"),
      ("lactate_threshold", "tempo"), // symmetric lookup
      ("recovery", "speed"),
      ("anaerobic_capacity", "vo2max"),
      ("aerobic_base", "aerobic_base"),
      ("unknown", "unknown"),
      ("tempo", "unknown"), // not in matrix -> default
      ("recovery", "unknown") // not in matrix -> default
    ).toDF("a", "b")
    val got = df.select(
      Joins.trainingTypeSimilarityCol(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(0.8, 0.8, 0.2, 0.8, 1.0, 1.0, 0.3, 0.3))
    // every unordered pair of the 7 levels is present — the 0.3 default
    // only ever fires for 'unknown' combinations
    val lvls = Joins.TrainingTypes
    for (i <- lvls.indices; j <- i until lvls.size) {
      val key = Seq(lvls(i), lvls(j)).sorted.mkString("|")
      assert(Joins.TrainingTypeSimilarity.contains(key), key)
    }
  }

  test("weighted score: .45 pace + .35 distance + .20 type, clamped") {
    val df = Seq((300.0, 330.0, 10.0, 9.0, "tempo", "lactate_threshold"))
      .toDF("tp", "cp", "td", "cd", "tt", "ct")
    val got = df.select(Joins.similarityScore(col("tp"), col("cp"),
      col("td"), col("cd"), col("tt"), col("ct"))).head().getDouble(0)
    val want = ((1 - 30.0 / 300.0) * 0.45 + (1 - 1.0 / 10.0) * 0.35 +
      0.8 * 0.20) * 100.0
    assert(math.abs(got - want) < 1e-12)
    // identical workouts score exactly 100
    val same = Seq((300.0, 300.0, 10.0, 10.0, "tempo", "tempo"))
      .toDF("tp", "cp", "td", "cd", "tt", "ct")
    assert(same.select(Joins.similarityScore(col("tp"), col("cp"),
      col("td"), col("cd"), col("tt"), col("ct"))).head().getDouble(0) === 100.0)
    // wildly-off candidate clamps at 0, never negative
    val far = Seq((300.0, 1200.0, 10.0, 60.0, "recovery", "speed"))
      .toDF("tp", "cp", "td", "cd", "tt", "ct")
    assert(far.select(Joins.similarityScore(col("tp"), col("cp"),
      col("td"), col("cd"), col("tt"), col("ct"))).head().getDouble(0) === 0.0)
  }

  test("q_similarity_score: candidates inside the band, target excluded") {
    val rows = SparkEntry.queries("q_similarity_score")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("similarity_score"))
    assert(scores.forall(s => s >= 0.0 && s <= 100.0))
    // band is ±20% on the pace proxy -> the pace similarity term alone
    // bounds the score below 100 unless the candidate is exact
    val keys = rows.map(_.getAs[Long]("o_orderkey"))
    val target = Tables.orders(spark, sfDir).orderBy("o_orderkey")
      .select("o_orderkey").head().getLong(0)
    assert(!keys.contains(target))
  }
}
