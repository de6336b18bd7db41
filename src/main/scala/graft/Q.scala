package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: a Spark program plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL over the same
  * parquet tables. The driver hash-compares the two at sf0.01
  * (CORRECTNESS_r{N}.json); queries without an oracle get a rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
