package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

/** strength_sessions read path (reference readers/strength_sessions.py).
  *
  * The table keeps strength work out of the run-centric aggregates (issue
  * #450 in the reference); `category_counts` is stored as JSON text (DuckDB
  * JSON column) mapping ACTIVE exercise-set categories to counts, e.g.
  * `{"CRUNCH": 4, "PLANK": 7}`. The reader parses it into a typed map —
  * `from_json(MapType)`, mirroring readers/strength_sessions.py:105-121
  * (null / unparseable / non-object values all yield an empty map).
  */
object StrengthSessions {

  val CategoryCountsType: MapType = MapType(StringType, IntegerType)

  /** Sessions in [startDate, endDate] (inclusive, ISO strings) with
    * category_counts parsed; newest first like the reference reader.
    */
  def read(sessions: DataFrame, startDate: String, endDate: String): DataFrame =
    sessions
      .where(col("activity_date") >= lit(startDate).cast("date") &&
        col("activity_date") <= lit(endDate).cast("date"))
      .withColumn("category_counts",
        coalesce(from_json(col("category_counts"), CategoryCountsType),
          typedLit(Map.empty[String, Int])))
      .orderBy(col("activity_date").desc, col("activity_id").desc)

  /** Weekly strength-session load: sessions + active sets per configured
    * week bucket (feeds the training-load side of the weekly review).
    */
  def weeklyLoad(sessions: DataFrame, weekStartDay: Int = 0): DataFrame =
    sessions.groupBy(graft.operators.Aggregates
      .weekStartCol(col("activity_date"), weekStartDay).as("week_start"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(coalesce(col("active_sets"), lit(0))).as("active_sets"),
        sum(coalesce(col("active_duration_seconds"), lit(0)))
          .as("active_seconds"))
}
