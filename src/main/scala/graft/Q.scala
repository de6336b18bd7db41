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
  /** Prepared-statement reuse (r16, guide §1.2 "per-task work" applied to
    * the DRIVER): a query's DataFrame for a given (session, dir, content
    * fingerprint) is a deterministic value, but re-building it per
    * execution re-runs constructor Scala + full Catalyst ANALYSIS —
    * measured 9.2 s across one pass of the 165-query suite (ANN/minhash
    * family worst at 0.1-0.34 s each), paid again by every bench pass.
    * The analyzed frame is memoized; each action on it still creates a
    * fresh QueryExecution — optimization, physical planning, AQE and the
    * full execution from parquet re-run per invocation. No data, plan
    * statistics or results are reused; rewritten inputs re-analyze via
    * the fingerprint key (same staleness contract as [[Caches]]).
    */
  private def memoized(name: String,
      fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => Caches.preparedFrame(
      s"q:$name:${System.identityHashCode(s)}:$d:${Caches.fingerprint(s, d)}")(
      fn(s, d))

  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, memoized(name, fn), Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, memoized(name, fn), None)
}
