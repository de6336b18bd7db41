package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Scratch profiler (NOT part of the library): runs the named queries once
  * warm, then prints per-query job count and per-job wall durations so the
  * tail queries' cost can be attributed to job-count floor vs compute.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = GraftSession.build("graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    val jobStarts = mutable.Map[Int, Long]()
    val jobs = mutable.ArrayBuffer[(Int, Double)]()
    val stages = mutable.ArrayBuffer[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStarts(e.jobId) = e.time
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs += ((e.jobId, (e.time - jobStarts.getOrElse(e.jobId, e.time)) / 1e3))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1e3).getOrElse(-1.0)
        val m = si.taskMetrics
        val detail = if (m == null) "" else
          f" cpu=${m.executorCpuTime / 1e9}%.2f deser=${m.executorDeserializeCpuTime / 1e9}%.2f run=${m.executorRunTime / 1e3}%.2f gc=${m.jvmGCTime / 1e3}%.2f srecs=${m.shuffleReadMetrics.recordsRead} peak=${m.peakExecutionMemory / 1048576}M"
        stages += ((si.stageId, s"${si.name.takeWhile(_ != '\n').take(40)} tasks=${si.numTasks}$detail", dur))
      }
    })
    val qs = SparkEntry.queries
    // warm-up + cache barrier
    names.foreach(n => qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save())
    Caches.warm()
    for (n <- names) {
      jobs.clear(); stages.clear()
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"== $n wall=$wall%.3f jobs=${jobs.size} jobsum=${jobs.map(_._2).sum}%.3f")
      jobs.sortBy(_._1).foreach { case (id, d) => println(f"   job $id%3d  $d%7.3f s") }
      stages.sortBy(-_._3).take(8).foreach { case (id, nm, d) => println(f"   stage $id%4d $d%7.3f s  $nm") }
    }
    spark.stop()
  }
}
