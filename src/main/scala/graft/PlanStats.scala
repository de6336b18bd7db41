package graft

/** Dev tool: print every registered query's ShuffleExchange count (prepared
  * physical plan, AQE off so the exchanges are visible) as `name count`
  * lines — for inspecting plan shape at an arbitrary scale factor:
  * `sbt "runMain graft.PlanStats /root/testdata/sf0.1"`. The COMMITTED
  * shuffle budget lives in src/test/resources/shuffle_budget.tsv and is
  * (re)recorded by PlanAuditSpec under SHUFFLE_BUDGET_RECORD=1, not here.
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.build("graft-planstats")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sfDir).queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      println(s"PLANSTAT $name $n")
    }
    spark.stop()
  }
}
