package graft

import graft.domain.FormBaseline
import graft.functions.Huber

/** Trainer robustness (Huber vs planted outliers, gates, monotonicity) and
  * scorer rule pinning (asymmetric penalties, consistency bands, stars).
  */
class FormBaselineSpec extends SparkSpec {

  test("Huber recovers a line through planted gross outliers (OLS would not)") {
    import spark.implicits._
    // y = 2 + 0.5x with 10% wild outliers
    val pts = (0 until 100).map { i =>
      val x = 1.0 + i * 0.05
      val noise = 0.01 * (if (i % 2 == 0) 1 else -1)
      val y = if (i % 10 == 9) 50.0 else 2.0 + 0.5 * x + noise
      (x, y)
    }
    val df = pts.toDF("x", "y")
    val h = Huber.fit(df, "x", "y")
    assert(math.abs(h.a - 2.0) < 0.05, s"a=${h.a}")
    assert(math.abs(h.b - 0.5) < 0.02, s"b=${h.b}")
    // plain OLS for contrast is dragged far off
    val ols = {
      val s = df.selectExpr("count(*) n", "sum(x) sx", "sum(y) sy",
        "sum(x*x) sxx", "sum(x*y) sxy").head()
      val n = s.getAs[Long]("n").toDouble
      (s.getAs[Double]("sxy") - s.getAs[Double]("sx") * s.getAs[Double]("sy") / n) /
        (s.getAs[Double]("sxx") - s.getAs[Double]("sx") * s.getAs[Double]("sx") / n)
    }
    assert(math.abs(ols - 0.5) > 0.3, s"outliers should wreck OLS, got $ols")
  }

  test("GCT power-law fit: d < 0, gates drop out-of-range rows, inverse works") {
    import spark.implicits._
    // true model: v = exp(5.9) * gct^(-0.8) (keeps v inside the 1.5-7 m/s
    // gate across the gct range); plus rows outside the gates
    val pts = (0 until 60).map { i =>
      val gct = 180.0 + i * 2 // 180..298 ms
      val v = math.exp(5.9 - 0.8 * math.log(gct)) * (1 + 0.005 * (if (i % 2 == 0) 1 else -1))
      (gct, v)
    } ++ Seq((50.0, 3.0), (500.0, 3.0), (250.0, 20.0)) // gated out
    val m = FormBaseline.fitGctPower(pts.toDF("gct_ms", "speed_mps"))
    assert(m.d < 0)
    assert(math.abs(m.d - (-0.8)) < 0.02, s"d=${m.d}")
    assert(m.n === 60) // the 3 out-of-range rows never reached the fit
    val v240 = m.predict(240.0)
    assert(math.abs(m.predictInverse(v240) - 240.0) < 1e-6)
  }

  test("linear VO fit recovers slope under gates") {
    import spark.implicits._
    val pts = (0 until 50).map { i =>
      val v = 2.0 + i * 0.08 // speed 2..5.9
      (7.0 + 0.9 * v + 0.01 * (if (i % 2 == 0) 1 else -1), v)
    } :+ ((25.0, 3.0)) // vo gated out (>15)
    val m = FormBaseline.fitLinear(pts.toDF("vo_cm", "speed_mps"), "vo", "vo_cm")
    assert(math.abs(m.b - 0.9) < 0.05, s"b=${m.b}")
    assert(m.n === 50)
  }

  test("asymmetric penalties: improvement dampened, cadence direction reversed") {
    // gct -5% (improvement): 5 * 0.3 * 10 = 15; +5% (worse): 50
    assert(FormBaseline.penalty("gct", -5.0) === 15.0)
    assert(FormBaseline.penalty("gct", 5.0) === 50.0)
    // vr improvement factor 0.2
    assert(FormBaseline.penalty("vr", -5.0) === 10.0)
    // cadence: POSITIVE delta is the improvement
    assert(FormBaseline.penalty("cadence", 5.0) === 15.0)
    assert(FormBaseline.penalty("cadence", -5.0) === 50.0)
    // clamp at 100
    assert(FormBaseline.penalty("gct", 50.0) === 100.0)
  }

  test("consistency adjustment: all-improved bonus capped, spread bands") {
    assert(FormBaseline.consistencyAdjustment(-2, -2, -2) === 1.0) // |−6|/3*0.5
    assert(FormBaseline.consistencyAdjustment(-20, -20, -20) === 5.0) // capped
    assert(FormBaseline.consistencyAdjustment(0, 0, 6) === -2.0)
    assert(FormBaseline.consistencyAdjustment(0, 0, 11) === -5.0)
    assert(FormBaseline.consistencyAdjustment(0, 0, 16) === -10.0)
    assert(FormBaseline.consistencyAdjustment(1, 2, 3) === 0.0)
  }

  test("score composition and needs-improvement flags") {
    val s = FormBaseline.score(5.0, -5.0, 0.0) // penalties 50, 15, 0; spread 10 -> -2
    assert(math.abs(s.score - (100.0 - 65.0 / 3 - 2.0)) < 1e-9)
    assert(s.gctNeedsImprovement && !s.voNeedsImprovement && !s.vrNeedsImprovement)
  }

  test("star bands and exact star strings") {
    assert(FormBaseline.starRating(8.0) ===
      FormBaseline.StarRating("★★★★★", 5.0, "excellent"))
    assert(FormBaseline.starRating(19.9).stars === "★★★★☆")
    assert(FormBaseline.starRating(40.0).category === "below_average")
    assert(FormBaseline.starRating(60.0) ===
      FormBaseline.StarRating("★☆☆☆☆", 1.0, "poor"))
  }
}
