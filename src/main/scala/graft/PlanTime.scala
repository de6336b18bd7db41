package graft

/** Scratch measurement tool (r16, guide §1): per-query decomposition of
  * wall into (a) DataFrame construction (analysis), (b) optimize+physical
  * planning, (c) execution (noop write, includes AQE re-planning). Run
  * warm (full warm-up pass + cache barrier first), so the split reflects
  * the steady state Bench times. Output: one TSV line per query.
  *
  * `runMain graft.PlanTime [sfDir]`
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.build("graft-plantime")
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm-up + cache barrier, same as Bench
    qs.foreach { case (_, fn) =>
      fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
    Caches.warm()
    println("query\tconstruct_s\tplan_s\texec_s\ttotal_s")
    qs.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      // force analysis + optimization + physical planning (pre-AQE)
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      def s(a: Long, b: Long) = (b - a) / 1e9
      println(f"$name\t${s(t0, t1)}%.3f\t${s(t1, t2)}%.3f\t${s(t2, t3)}%.3f\t${s(t0, t3)}%.3f")
    }
    spark.stop()
  }
}
