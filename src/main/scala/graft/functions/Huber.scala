package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust regression via distributed IRLS (iteratively reweighted least
  * squares) with the Huber loss — the engine for the form-baseline trainer
  * (reference pkg/form_baseline/trainer.py uses sklearn HuberRegressor /
  * RANSACRegressor over pandas frames).
  *
  * Scale design: each iteration is two tiny aggregates over the input —
  * an exact-median MAD for the scale estimate and the weighted
  * normal-equation sums — so the model state on the driver is five doubles
  * regardless of input size. ~10-30 iterations converge; the input frame
  * should be cached by the caller if it isn't a cheap scan.
  */
object Huber {

  final case class Fit(a: Double, b: Double, rmse: Double, n: Long)

  /** y = a + b*x under Huber loss. `epsilon` is the inlier half-width in
    * scale units (1.35 ≈ 95 % Gaussian efficiency, sklearn's default).
    */
  def fit(df: DataFrame, xCol: String, yCol: String,
      epsilon: Double = 1.35, maxIter: Int = 30, tol: Double = 1e-10): Fit = {
    val data = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).na.drop()
    // OLS init
    val init = data.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy")).head()
    val n = init.getAs[Long]("n")
    require(n >= 2, s"Huber.fit needs >= 2 points, got $n")
    var b = (init.getAs[Double]("sxy") - init.getAs[Double]("sx") * init.getAs[Double]("sy") / n) /
      (init.getAs[Double]("sxx") - init.getAs[Double]("sx") * init.getAs[Double]("sx") / n)
    var a = (init.getAs[Double]("sy") - b * init.getAs[Double]("sx")) / n

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val r = col("y") - lit(a) - lit(b) * col("x")
      val mad = data.agg(median(abs(r))).head().getDouble(0)
      val sigma = math.max(1.4826 * mad, 1e-12)
      val cut = lit(epsilon * sigma)
      val w = when(abs(r) <= cut, 1.0).otherwise(cut / abs(r))
      val s = data.agg(
        sum(w).as("sw"), sum(w * col("x")).as("swx"), sum(w * col("y")).as("swy"),
        sum(w * col("x") * col("x")).as("swxx"),
        sum(w * col("x") * col("y")).as("swxy")).head()
      val (sw, swx, swy, swxx, swxy) = (s.getAs[Double]("sw"), s.getAs[Double]("swx"),
        s.getAs[Double]("swy"), s.getAs[Double]("swxx"), s.getAs[Double]("swxy"))
      val bNew = (swxy - swx * swy / sw) / (swxx - swx * swx / sw)
      val aNew = (swy - bNew * swx) / sw
      converged = math.abs(aNew - a) + math.abs(bNew - b) < tol
      a = aNew; b = bNew
      iter += 1
    }
    val rmse = math.sqrt(data
      .agg(avg(pow(col("y") - lit(a) - lit(b) * col("x"), 2))).head().getDouble(0))
    Fit(a, b, rmse, n)
  }

  /** Deterministic RANSAC-style fallback: `trials` fixed 80 % subsets
    * (hash-partitioned, no RNG — reproducible across runs), OLS per subset,
    * scored by inlier count at the MAD threshold; best model wins.
    * Mirrors the reference's RANSACRegressor(min_samples=0.8n) fallback
    * role: recover a monotonic fit when gross outliers bend Huber.
    */
  def ransac(df: DataFrame, xCol: String, yCol: String, trials: Int = 10): Fit = {
    val data = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).na.drop()
    val mad = {
      val med = data.agg(median(col("y"))).head().getDouble(0)
      math.max(data.agg(median(abs(col("y") - lit(med)))).head().getDouble(0), 1e-12)
    }
    val fits = (0 until trials).map { t =>
      val subset = data.where(pmod(xxhash64(col("x"), col("y"), lit(t)), lit(5)) =!= 0)
      val s = subset.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy")).head()
      val n = s.getAs[Long]("n")
      if (n < 3) None
      else {
        val b = (s.getAs[Double]("sxy") - s.getAs[Double]("sx") * s.getAs[Double]("sy") / n) /
          (s.getAs[Double]("sxx") - s.getAs[Double]("sx") * s.getAs[Double]("sx") / n)
        val a = (s.getAs[Double]("sy") - b * s.getAs[Double]("sx")) / n
        val inliers = data
          .where(abs(col("y") - lit(a) - lit(b) * col("x")) <= lit(3.0 * 1.4826 * mad))
          .count()
        Some((inliers, Fit(a, b, 0.0, n)))
      }
    }.flatten
    require(fits.nonEmpty, "RANSAC: all trial subsets degenerate")
    val best = fits.maxBy(_._1)._2
    val rmse = math.sqrt(data
      .agg(avg(pow(col("y") - lit(best.a) - lit(best.b) * col("x"), 2)))
      .head().getDouble(0))
    best.copy(rmse = rmse)
  }
}
