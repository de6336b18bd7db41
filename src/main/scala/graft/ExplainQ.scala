package graft

/** Plan inspector: `runMain graft.ExplainQ <sfDir> <query>[,<query>...]`
  * prints each named query's formatted physical plan at that scale
  * directory (AQE off for the planning pass, same setup as
  * [[ShuffleCount]] — registry warmed first so memoized frames appear as
  * their cached reads, exactly as the counted plans do). The adjudication
  * companion to ShuffleCount: when the budget diff flags a flip, this is
  * how you look at WHAT flipped before blessing it.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ExplainQ <sfDir> <q1>[,<q2>...]")
    val Array(sfDir, names) = args
    val spark = GraftSession.build("graft-explainq")
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      fn(spark, sfDir) }
    Caches.warm()
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      names.split(",").map(_.trim).foreach { n =>
        println(s"===== $n @ $sfDir =====")
        println(SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
