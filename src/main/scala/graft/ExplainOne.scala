package graft

/** Dev tool: print ONE query's formatted physical plan in the WARM cache
  * state — `runMain graft.ExplainOne <name> <sfDir>`.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = GraftSession.build(s"graft-explain-$name")
    spark.sparkContext.setLogLevel("WARN")
    // warm state: register + materialize the shared frames first
    SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite")
      .format("noop").save()
    Caches.warm()
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
