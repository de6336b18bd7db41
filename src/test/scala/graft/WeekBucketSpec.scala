package graft

import java.sql.Date
import graft.operators.Aggregates
import org.apache.spark.sql.functions._

/** Configurable week-start bucketing (reference pkg/utils/week.py:
  * week_start(d, start_day), 0=Monday … 6=Sunday in the Python weekday
  * convention).
  */
class WeekBucketSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01 is a Monday.
  private val days = (0 until 14).map(i =>
    (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)), 1.0))

  test("weekStartCol matches the reference offset rule for every start day") {
    val df = days.toDF("d", "v")
    for (start <- 0 to 6) {
      val got = df.select(col("d"),
        Aggregates.weekStartCol(col("d"), start).as("ws"))
        .collect().map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
      got.foreach { case (d, ws) =>
        // reference: offset = (d.weekday() - start) % 7; start = d - offset
        val weekday = d.getDayOfWeek.getValue - 1 // Monday=0 … Sunday=6
        val offset = ((weekday - start) % 7 + 7) % 7
        assert(ws === d.minusDays(offset.toLong),
          s"start=$start d=$d ws=$ws")
        // the bucket start always falls on the configured day
        assert((ws.getDayOfWeek.getValue - 1) === start)
      }
    }
  }

  test("Monday start equals the date_trunc('week') bucket") {
    val df = days.toDF("d", "v")
    val cfg = Aggregates.weekBucketCfg(df, "d", "v", startDay = 0)
    val std = Aggregates.weekBucket(df, "d", "v")
    assert(cfg.exceptAll(std).isEmpty && std.exceptAll(cfg).isEmpty)
  }

  test("Sunday start splits a Monday-aligned fortnight into three buckets") {
    val df = days.toDF("d", "v")
    val buckets = Aggregates.weekBucketCfg(df, "d", "v", startDay = 6)
      .orderBy("week_start")
      .collect().map(r => (r.getDate(0).toLocalDate.toString, r.getAs[Long]("n_rows")))
    // Mon 1/1 … Sun 1/14: Sunday-start weeks begin 12/31, 1/7, 1/14
    assert(buckets.toSeq === Seq(
      ("2023-12-31", 6L), ("2024-01-07", 7L), ("2024-01-14", 1L)))
  }

  test("weekStartDayOf reads the profile and falls back to Monday") {
    val profile = Seq(("default", Some(6)), ("other", None))
      .toDF("user_id", "week_start_day")
    assert(Aggregates.weekStartDayOf(profile) === 6)
    assert(Aggregates.weekStartDayOf(profile, "other") === 0) // null column
    assert(Aggregates.weekStartDayOf(profile, "absent") === 0) // no row
  }
}
