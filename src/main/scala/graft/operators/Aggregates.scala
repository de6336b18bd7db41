package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4).
  *
  * Re-expresses the reference's aggregate surface — per-group stats blocks
  * (splits_query_builder.py:152-173), time-range stats
  * (readers/time_series.py:56-130), calendar buckets
  * (web/queries/trends.py:102-171), conditional-halves decoupling
  * (readers/durability.py:120-146), weighted averages
  * (inserters/performance_trends.py:263-318), coefficient of variation
  * (performance_trends.py:62-104,339-348), profiler & histogram
  * (readers/utility.py:100-146,252-278), share-of-total zone distribution
  * (inserters/hr_efficiency.py:137-156) — over the synthetic star schema.
  *
  * Scale notes: every operator here is a single hash-aggregate plan
  * (partial map-side combine + final), so it scales linearly with input and
  * shuffles only the group keys. Exact `median` is used (not
  * percentile_approx) because the DuckDB oracle is exact — at the 100 TB
  * tier the approx variants live in Similarity/Dedup paths, never in
  * oracle-checked operators (SURVEY §4.2).
  */
object Aggregates {

  /** AVG/MEDIAN/STDDEV/MIN/MAX stats block per group per metric. */
  def statsBlock(df: DataFrame, groupCols: Seq[String], metrics: Seq[String]): DataFrame = {
    val aggs = metrics.flatMap { m =>
      Seq(
        avg(col(m)).as(s"avg_$m"),
        median(col(m)).as(s"median_$m"),
        stddev(col(m)).as(s"stddev_$m"),
        min(col(m)).as(s"min_$m"),
        max(col(m)).as(s"max_$m"))
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Half-open time-range stats: ts ∈ [from, until). Reference uses
    * half-open ranges for time windows (time_series.py:73-76).
    */
  def timeRangeStats(df: DataFrame, tsCol: String, from: String, until: String,
      valueCol: String): DataFrame =
    df.filter(col(tsCol) >= lit(from).cast("timestamp") &&
              col(tsCol) < lit(until).cast("timestamp"))
      .agg(
        avg(col(valueCol)).as("avg_v"),
        stddev(col(valueCol)).as("stddev_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        count(col(valueCol)).as("n_rows"))

  /** Calendar month bucket (strftime('%Y-%m') in the reference). */
  def monthBucket(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(date_format(col(tsCol), "yyyy-MM").as("month"))
      .agg(sum(col(valueCol)).as("total_v"), count(lit(1)).as("n_rows"))

  /** Calendar week bucket, Monday-start (reference computes week start from
    * isodow and a configurable week_start_day; Monday is the default).
    */
  def weekBucket(df: DataFrame, tsCol: String, valueCol: String): DataFrame =
    df.groupBy(to_date(date_trunc("week", col(tsCol))).as("week_start"))
      .agg(sum(col(valueCol)).as("total_v"), count(lit(1)).as("n_rows"))

  /** Conditional-halves aggregation (cardiac-decoupling shape): one pass
    * computing avg(value) for each temporal half of every group, split at
    * the group's timestamp midpoint. Two aggregations total; the per-group
    * bounds side is tiny and broadcast.
    */
  def conditionalHalves(df: DataFrame, partCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val secs = unix_timestamp(col(tsCol))
    val bounds = df.groupBy(col(partCol))
      .agg(min(secs).as("t0"), max(secs).as("t1"))
    df.join(broadcast(bounds), partCol)
      .withColumn("mid", (col("t0") + col("t1")) / 2.0)
      .groupBy(col(partCol))
      .agg(
        avg(when(secs < col("mid"), col(valueCol))).as("first_avg"),
        avg(when(secs >= col("mid"), col(valueCol))).as("second_avg"))
      .withColumn("decoupling_pct",
        (col("second_avg") / col("first_avg") - 1.0) * 100.0)
  }

  /** Per-group share of total (zone time distribution shape). The global
    * total is a 1-row aggregate joined back — never a single-partition
    * window over the full table.
    */
  def shareOfTotal(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val grouped = df.groupBy(col(keyCol)).agg(sum(col(valueCol)).as("group_v"))
    val total = grouped.agg(sum(col("group_v")).as("total_v"))
    grouped.crossJoin(broadcast(total))
      .select(col(keyCol), col("group_v"),
        (col("group_v") / col("total_v") * 100.0).as("pct"))
  }

  /** Value-weighted average: Σ(metric·weight)/Σ(weight) per group
    * (distance-weighted pace / time-weighted HR in the reference).
    */
  def weightedAvg(df: DataFrame, groupCol: String, metricCol: String,
      weightCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg((sum(col(metricCol) * col(weightCol)) / sum(col(weightCol)))
        .as("weighted_v"))

  /** Coefficient of variation, plain and fragment-robust (rows below
    * 0.5×median(group) excluded, mirroring the GPS-fragment lap filter).
    */
  def cvRobust(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val med = df.groupBy(col(groupCol)).agg(median(col(valueCol)).as("med_v"))
    val plain = df.groupBy(col(groupCol))
      .agg((stddev(col(valueCol)) / avg(col(valueCol))).as("cv"))
    val robust = df.join(broadcast(med), groupCol)
      .filter(col(valueCol) >= col("med_v") * 0.5)
      .groupBy(col(groupCol))
      .agg((stddev(col(valueCol)) / avg(col(valueCol))).as("cv_robust"))
    plain.join(robust, Seq(groupCol), "left")
  }

  /** Column profiler: one output row per profiled column with
    * min/max/avg/median/stddev/null count/exact distinct count
    * (readers/utility.py:100-146). Single scan: one wide aggregate row,
    * unpivoted with `stack`.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // Grouped-histogram formulation: one groupBy(value) per column, then
    // every statistic — including the EXACT median and distinct count —
    // falls out of the (value, count) histogram. This replaces both the
    // multi-countDistinct Expand (x#distinct scan multiplier) and the
    // typed-imperative Median buffers (per-executor value collections) with
    // plain hash aggregation + one sorted cumulative-sum window over the
    // distinct values (measured 17 s -> 10 s -> ~1 s at sf0.1). At 100 TB
    // the histogram is bounded by the value domain, not the row count.
    cols.map { c =>
      val g = df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val nonNull = g.where(col("v").isNotNull)
        .withColumn("cum", sum("cnt").over(
          Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // interpolated median over the cumulative histogram: mean of the
      // values at 1-based positions floor((n+1)/2) and ceil((n+1)/2);
      // "value at position p" = min v with cum >= p
      val medianDf = nonNull
        .withColumn("n", sum("cnt").over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .agg(((min(when(col("cum") >= floor((col("n") + 1) / lit(2.0)), col("v")))
            .cast("double") +
          min(when(col("cum") >= ceil((col("n") + 1) / lit(2.0)), col("v")))
            .cast("double")) / 2.0).as("median_v"))
      val stats = g.agg(
        min(col("v")).cast("double").as("min_v"),
        max(col("v")).cast("double").as("max_v"),
        (sum(col("v") * col("cnt")) / sum(when(col("v").isNotNull, col("cnt")))).as("avg_v"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("null_cnt"),
        count(col("v")).as("distinct_cnt"),
        // sample stddev from histogram moments
        sqrt((sum(col("v") * col("v") * col("cnt")) -
          pow(sum(col("v") * col("cnt")), 2) / sum(when(col("v").isNotNull, col("cnt")))) /
          (sum(when(col("v").isNotNull, col("cnt"))) - 1)).as("stddev_v"))
      stats.crossJoin(medianDf)
        .select(lit(c).as("col_name"), col("min_v"), col("max_v"), col("avg_v"),
          col("median_v"), col("stddev_v"), col("null_cnt"), col("distinct_cnt"))
    }.reduce(_ unionByName _)
  }

  /** Equi-width histogram: FLOOR((x-min)/width) buckets with per-bin
    * count/min/max (readers/utility.py:252-278). Bounds come from a 1-row
    * aggregate broadcast back over the scan (two passes, no global sort).
    */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    val bounds = df.agg(min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(floor((col(valueCol) - col("mn")) /
          ((col("mx") - col("mn")) / nBuckets)), lit(nBuckets - 1L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col(valueCol)).as("bin_min"),
        max(col(valueCol)).as("bin_max"))
  }

  /** Category distribution: counts plus fraction of total. */
  def distribution(df: DataFrame, keyCol: String): DataFrame = {
    val grouped = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val total = grouped.agg(sum("cnt").as("total"))
    grouped.crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("total")).as("frac"))
  }

  // ---------------------------------------------------------------- queries

  val entries: Seq[Q] = Seq(
    Q("q_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          avg("l_extendedprice").as("avg_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    Q("q_stats_block",
      """SELECT l_returnflag,
        |  avg(l_quantity) AS avg_l_quantity,
        |  median(l_quantity) AS median_l_quantity,
        |  stddev(l_quantity) AS stddev_l_quantity,
        |  min(l_quantity) AS min_l_quantity,
        |  max(l_quantity) AS max_l_quantity,
        |  avg(l_extendedprice) AS avg_l_extendedprice,
        |  median(l_extendedprice) AS median_l_extendedprice,
        |  stddev(l_extendedprice) AS stddev_l_extendedprice,
        |  min(l_extendedprice) AS min_l_extendedprice,
        |  max(l_extendedprice) AS max_l_extendedprice,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      statsBlock(Tables.lineitem(s, d), Seq("l_returnflag"),
        Seq("l_quantity", "l_extendedprice"))
        .orderBy("l_returnflag")
    },

    Q("q_time_range_stats",
      """SELECT avg(value) AS avg_v, stddev(value) AS stddev_v,
        |  min(value) AS min_v, max(value) AS max_v, count(value) AS n_rows
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'""".stripMargin) { (s, d) =>
      timeRangeStats(Tables.events(s, d), "ts",
        "2024-01-10 00:00:00", "2024-01-20 00:00:00", "value")
    },

    Q("q_grouped_avg",
      """SELECT user_id, avg(value) AS avg_v, count(*) AS n_rows
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d).groupBy("user_id")
        .agg(avg("value").as("avg_v"), count(lit(1)).as("n_rows"))
        .orderBy("user_id")
    },

    Q("q_daily_load",
      """SELECT CAST(ts AS DATE) AS day, sum(value) AS daily_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum("value").as("daily_v"))
        .orderBy("day")
    },

    Q("q_month_bucket",
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  sum(o_totalprice) AS total_v, count(*) AS n_rows
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      monthBucket(Tables.orders(s, d), "o_orderdate", "o_totalprice")
        .orderBy("month")
    },

    Q("q_week_bucket",
      """SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
        |  sum(o_totalprice) AS total_v, count(*) AS n_rows
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      weekBucket(Tables.orders(s, d), "o_orderdate", "o_totalprice")
        .orderBy("week_start")
    },

    Q("q_decoupling_halves",
      """WITH b AS (
        |  SELECT user_id, min(epoch_ms(ts)//1000) AS t0,
        |         max(epoch_ms(ts)//1000) AS t1
        |  FROM events GROUP BY 1)
        |SELECT e.user_id,
        |  avg(CASE WHEN epoch_ms(e.ts)//1000 < (b.t0 + b.t1) / 2.0
        |      THEN e.value END) AS first_avg,
        |  avg(CASE WHEN epoch_ms(e.ts)//1000 >= (b.t0 + b.t1) / 2.0
        |      THEN e.value END) AS second_avg,
        |  (avg(CASE WHEN epoch_ms(e.ts)//1000 >= (b.t0 + b.t1) / 2.0
        |       THEN e.value END) /
        |   avg(CASE WHEN epoch_ms(e.ts)//1000 < (b.t0 + b.t1) / 2.0
        |       THEN e.value END) - 1.0) * 100.0 AS decoupling_pct
        |FROM events e JOIN b USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      conditionalHalves(Tables.events(s, d), "user_id", "ts", "value")
        .orderBy("user_id")
    },

    Q("q_zone_distribution",
      """WITH g AS (
        |  SELECT event_type, sum(value) AS group_v FROM events GROUP BY 1)
        |SELECT event_type, group_v,
        |  group_v / (SELECT sum(group_v) FROM g) * 100.0 AS pct
        |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
      shareOfTotal(Tables.events(s, d), "event_type", "value")
        .orderBy("event_type")
    },

    Q("q_weighted_avg",
      """SELECT l_suppkey,
        |  sum(l_extendedprice * l_quantity) / sum(l_quantity) AS weighted_v
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      weightedAvg(Tables.lineitem(s, d), "l_suppkey", "l_extendedprice",
        "l_quantity").orderBy("l_suppkey")
    },

    Q("q_cv_robust",
      """WITH med AS (
        |  SELECT l_returnflag, median(l_quantity) AS med_v
        |  FROM lineitem GROUP BY 1),
        |plain AS (
        |  SELECT l_returnflag, stddev(l_quantity) / avg(l_quantity) AS cv
        |  FROM lineitem GROUP BY 1),
        |robust AS (
        |  SELECT l.l_returnflag,
        |    stddev(l.l_quantity) / avg(l.l_quantity) AS cv_robust
        |  FROM lineitem l JOIN med m USING (l_returnflag)
        |  WHERE l.l_quantity >= m.med_v * 0.5 GROUP BY 1)
        |SELECT p.l_returnflag, p.cv, r.cv_robust
        |FROM plain p LEFT JOIN robust r USING (l_returnflag)
        |ORDER BY 1""".stripMargin) { (s, d) =>
      cvRobust(Tables.lineitem(s, d), "l_returnflag", "l_quantity")
        .orderBy("l_returnflag")
    },

    Q("q_profile",
      """WITH a AS (SELECT
        |  CAST(min(l_quantity) AS DOUBLE) AS min_q,
        |  CAST(max(l_quantity) AS DOUBLE) AS max_q,
        |  avg(l_quantity) AS avg_q, median(l_quantity) AS median_q,
        |  stddev(l_quantity) AS stddev_q,
        |  count(*) - count(l_quantity) AS nulls_q,
        |  count(DISTINCT l_quantity) AS distinct_q,
        |  CAST(min(l_extendedprice) AS DOUBLE) AS min_p,
        |  CAST(max(l_extendedprice) AS DOUBLE) AS max_p,
        |  avg(l_extendedprice) AS avg_p, median(l_extendedprice) AS median_p,
        |  stddev(l_extendedprice) AS stddev_p,
        |  count(*) - count(l_extendedprice) AS nulls_p,
        |  count(DISTINCT l_extendedprice) AS distinct_p,
        |  CAST(min(l_discount) AS DOUBLE) AS min_d,
        |  CAST(max(l_discount) AS DOUBLE) AS max_d,
        |  avg(l_discount) AS avg_d, median(l_discount) AS median_d,
        |  stddev(l_discount) AS stddev_d,
        |  count(*) - count(l_discount) AS nulls_d,
        |  count(DISTINCT l_discount) AS distinct_d
        |  FROM lineitem)
        |SELECT 'l_quantity' AS col_name, min_q AS min_v, max_q AS max_v,
        |  avg_q AS avg_v, median_q AS median_v, stddev_q AS stddev_v,
        |  nulls_q AS null_cnt, distinct_q AS distinct_cnt FROM a
        |UNION ALL
        |SELECT 'l_extendedprice', min_p, max_p, avg_p, median_p, stddev_p,
        |  nulls_p, distinct_p FROM a
        |UNION ALL
        |SELECT 'l_discount', min_d, max_d, avg_d, median_d, stddev_d,
        |  nulls_d, distinct_d FROM a
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      profile(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("col_name")
    },

    Q("q_histogram",
      """WITH b AS (
        |  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |  FROM lineitem)
        |SELECT CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 10)),
        |            9) AS BIGINT) AS bucket,
        |  count(*) AS cnt, min(l_extendedprice) AS bin_min,
        |  max(l_extendedprice) AS bin_max
        |FROM lineitem, b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      histogram(Tables.lineitem(s, d), "l_extendedprice", 10).orderBy("bucket")
    },

    Q("q_type_distribution",
      """WITH g AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1)
        |SELECT event_type, cnt,
        |  CAST(cnt AS DOUBLE) / (SELECT sum(cnt) FROM g) AS frac
        |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
      distribution(Tables.events(s, d), "event_type").orderBy("event_type")
    }
  )
}
