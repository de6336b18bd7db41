package graft

/** Scratch probe (NOT part of the library): pins the per-query fixed-cost
  * floor by timing minimal plan shapes warm — the denominators for deciding
  * whether a 0.3 s bench query is compute or harness floor.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-floor")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String, reps: Int = 5)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      noop(mk) // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $name%-34s min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f max=${ts.max}%.3f")
    }
    time("range10_noop") { spark.range(10).toDF("id") }
    time("range10_sort") { spark.range(10).toDF("id").orderBy("id") }
    time("range10_groupby") { spark.range(10).toDF("id").groupBy("id").count() }
    time("range10_groupby_sort") {
      spark.range(10).toDF("id").groupBy("id").count().orderBy("id") }
    time("range1m_noop") { spark.range(1000000L).toDF("id") }
    time("events_scan") { Tables.events(spark, sfDir) }
    time("events_scan_sort") { Tables.events(spark, sfDir).orderBy("event_id") }
    time("events_groupby") {
      Tables.events(spark, sfDir).groupBy("user_id").agg(sum("value")) }
    time("events_groupby_sort") {
      Tables.events(spark, sfDir).groupBy("user_id").agg(sum("value"))
        .orderBy("user_id") }
    time("events_win") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      Tables.events(spark, sfDir).select(col("event_id"),
        row_number().over(w).as("rn")) }
    time("events_win_sort") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      Tables.events(spark, sfDir).select(col("event_id"),
        row_number().over(w).as("rn")).orderBy("event_id") }
    spark.stop()
  }
}
