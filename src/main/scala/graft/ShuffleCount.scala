package graft

/** Per-query ShuffleExchange counts for an arbitrary sf directory — the
  * CLI twin of PlanAuditSpec's shuffle-budget test, for diffing the
  * committed budget (recorded at test scale) against the plans Catalyst
  * produces on 10×/100× replicas: a count that moves with DATA SIZE
  * under an identical session exposes a size-triggered strategy flip
  * (broadcast → SMJ being the canonical one) that the fixed-scale
  * budget can't see.
  *
  * `runMain graft.ShuffleCount <sfDir>` → TSV on stdout (query \t count),
  * same canonical warm-cache state as the spec: every query constructed
  * (registers the memoized shared frames), registry force-materialized,
  * then counts taken on the PREPARED plan with AQE off for the planning
  * pass (AdaptiveSparkPlanExec hides its unfinalized subtree from
  * collect). Nothing executes in the counting pass.
  */
object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build("graft-shufflecount")
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      fn(spark, sfDir) }
    Caches.warm()
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val c = fn(spark, sfDir).queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
        println(s"$name\t$c")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
