package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling semantics that the oracle can't establish alone:
  * the two-phase (threshold, then window) plan must equal the naive
  * whole-stratum ranking, and the sample must be stable across runs.
  */
class SamplingSpec extends SparkSpec {

  private def run() = SparkEntry.queries("q_sample_stratified")(spark, sfDir)

  test("exactly k per stratum, ranks contiguous from 1") {
    val rows = run().collect().map(r =>
      (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val perLang = rows.groupBy(_._1)
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, rs) =>
      assert(rs.length === operators.Sampling.StratumK, s"lang $lang")
      assert(rs.map(_._2).sorted.toSeq === (1L to 20L), s"lang $lang ranks")
    }
  }

  test("two-phase threshold plan equals the naive full-stratum ranking") {
    val naive = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .withColumn("h",
        expr("((doc_id % 1000000007) * 2654435761) % 1000000007"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)))
      .where(col("rnk") <= operators.Sampling.StratumK)
      .select("lang", "rnk", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2))).toSet
    val sampled = run().collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2))).toSet
    assert(sampled === naive)
  }

  test("sample is identical across repeated runs (no RNG anywhere)") {
    val a = run().collect().toSeq
    val b = run().collect().toSeq
    assert(a === b)
  }

  test("mixture sample realizes the recipe weights and nothing else") {
    val rows = SparkEntry.queries("q_sample_mixture")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perSource = rows.groupBy(_._1).view.mapValues(_.length).toMap
    // sf0.001: 25 docs/source -> T = 50, quotas 25/15/10
    assert(perSource === Map("src0" -> 25, "src1" -> 15, "src2" -> 10))
    // realized fractions == recipe weights exactly at this T
    val total = perSource.values.sum.toDouble
    operators.Sampling.MixtureWeights.foreach { case (src, w) =>
      assert(math.abs(perSource(src) / total - w) < 0.02, src)
    }
    // domains outside the recipe contribute nothing
    assert(rows.map(_._1).toSet === Set("src0", "src1", "src2"))
  }

  test("weighted A-ES sample: keys rank-consistent, size exact, stable") {
    val rows = SparkEntry.queries("q_sample_weighted")(spark, sfDir).collect()
    val eligible = Tables.documents(spark, sfDir)
      .where(col("n_chars") > 0).count()
    assert(rows.length === math.min(operators.Sampling.WeightedK, eligible))
    // ranks contiguous from 1, keys non-increasing along the ranking
    assert(rows.map(_.getAs[Int]("rnk")).toSeq === (1 to rows.length))
    val keys = rows.map(_.getAs[Double]("key")).toSeq
    assert(keys === keys.sorted.reverse)
    // ln(u)/w keys are strictly negative (u in (0,1], w > 0) and every
    // sampled doc carries a positive weight
    assert(keys.forall(_ <= 0.0))
    assert(rows.forall(_.getAs[Long]("n_chars") > 0))
    // A-ES favors heavy docs: the sample's mean weight must exceed the
    // corpus mean (a length-weighted draw that did NOT would be broken)
    val corpusMean = Tables.documents(spark, sfDir)
      .where(col("n_chars") > 0).agg(avg("n_chars")).head.getDouble(0)
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
    // determinism across executions
    val again = SparkEntry.queries("q_sample_weighted")(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("temperature mixture: weights sum to 1 and flatten toward uniform") {
    val rows = SparkEntry.queries("q_mixture_temperature")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share_raw"))
    val temps = rows.map(_.getAs[Double]("w_temp"))
    assert(math.abs(shares.sum - 1.0) < 1e-12)
    assert(math.abs(temps.sum - 1.0) < 1e-12)
    rows.foreach { r =>
      val raw = r.getAs[Double]("share_raw")
      val t = r.getAs[Double]("w_temp")
      // α = 0.5 moves every weight strictly toward 1/|sources| (or keeps
      // it, when the corpus is already uniform)
      val u = 1.0 / rows.length
      assert(math.abs(t - u) <= math.abs(raw - u) + 1e-12)
      assert(r.getAs[Double]("boost") === t / raw)
      // quota never exceeds the source's population
      assert(r.getAs[Long]("quota") <= r.getAs[Long]("n"))
    }
  }
}
