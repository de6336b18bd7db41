package graft

import graft.functions.StudentT
import org.apache.spark.sql.functions._

/** q_trend_class's critical-value classifier must agree with the exact
  * p-value classifier (StudentT via commons-math) — the t-table +
  * Cornish-Fisher expansion is an oracle-compatibility reformulation, not
  * a semantic change.
  */
class TrendClassSpec extends SparkSpec {

  test("critical-value classification == exact p-value classification") {
    val got = SparkEntry.queries("q_trend_class")(spark, sfDir).collect()
    assert(got.nonEmpty)
    // exact-p replica of the original formulation
    val exact = Tables.events(spark, sfDir)
      .withColumn("x",
        (unix_timestamp(col("ts")) - 1704067200L).cast("double"))
      .groupBy("user_id")
      .agg(regr_slope(col("value"), col("x")).as("slope"),
        corr(col("value"), col("x")).as("r"),
        regr_count(col("value"), col("x")).as("n"))
      .withColumn("p_value", StudentT.corrPValue(col("r"), col("n")))
      .withColumn("direction",
        when(col("n") < 3 || col("p_value").isNull, "insufficient")
          .when(col("p_value") > 0.05, "stable")
          .when(col("slope") > 0, "improving")
          .otherwise("declining"))
      .select("user_id", "direction").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("direction")).toMap
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[String]("direction") === exact(u),
        s"user $u classified differently")
    }
  }

  test("ols se/vif oracle variant agrees with the distributed-Gram solver") {
    val wide = SparkEntry.queries("q_ols_se_vif")(spark, sfDir).head()
    val long = graft.operators.Stats.olsInference(spark,
      Tables.lineitem(spark, sfDir), "l_extendedprice",
      Seq("l_quantity", "l_discount")).collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    def close(a: Double, b: Double) =
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    assert(close(wide.getAs[Double]("b1"), long("l_quantity").getAs[Double]("beta")))
    assert(close(wide.getAs[Double]("se1"), long("l_quantity").getAs[Double]("std_err")))
    assert(close(wide.getAs[Double]("b2"), long("l_discount").getAs[Double]("beta")))
    assert(close(wide.getAs[Double]("se2"), long("l_discount").getAs[Double]("std_err")))
    assert(close(wide.getAs[Double]("vif"), long("l_quantity").getAs[Double]("vif")))
    // with 2 regressors both VIFs are the same 1/(1-r12²)
    assert(close(wide.getAs[Double]("vif"), long("l_discount").getAs[Double]("vif")))
  }

  test("degenerate series: too-few points and exact-linear input") {
    import spark.implicits._
    import java.sql.Timestamp
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-trend").toString
    def t(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    // user 1: 2 points (insufficient); user 2: exactly linear rising
    // (|r| = 1 -> improving, never a div-by-zero crash); user 3: constant
    // value (zero variance -> corr NaN in Spark -> insufficient)
    Seq(
      (1L, t(0), 1L, "a", 1.0, "{}"), (2L, t(1), 1L, "a", 2.0, "{}"),
      (3L, t(0), 2L, "a", 1.0, "{}"), (4L, t(1), 2L, "a", 2.0, "{}"),
      (5L, t(2), 2L, "a", 3.0, "{}"),
      (6L, t(0), 3L, "a", 5.0, "{}"), (7L, t(1), 3L, "a", 5.0, "{}"),
      (8L, t(2), 3L, "a", 5.0, "{}"),
      (9L, t(0), 4L, "a", 2.5, "{}")) // single event: n=1
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_trend_class")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("direction")).toMap
    assert(got === Map(1L -> "insufficient", 2L -> "improving",
      3L -> "insufficient", 4L -> "insufficient"))
  }
}
