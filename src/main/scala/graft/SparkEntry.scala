package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[Q]] in one of
  * the operator modules; this object is only the aggregation point.
  */
object SparkEntry {

  /** All registered operator queries, in registration order. */
  def all: Seq[Q] =
    operators.Aggregates.entries ++
    operators.Joins.entries ++
    operators.Windows.entries ++
    operators.Stats.entries ++
    operators.Scalars.entries ++
    operators.TextOps.entries ++
    operators.Sampling.entries ++
    operators.Dedup.entries ++
    operators.Curation.entries ++
    operators.Similarity.entries ++
    operators.Multimodal.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
