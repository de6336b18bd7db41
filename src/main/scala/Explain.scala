import graft._

/** Dev utility: print the formatted physical plan of registered queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("explain")
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args(0).split(",").foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
