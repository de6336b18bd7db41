package graft

/** Dev tool: run ONE registered query and dump its result + oracle SQL —
  * `runMain graft.RunOne <name> <sfDir> <outDir>` — so a single operator's
  * parity can be checked without the full Verify sweep.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = GraftSession.build(s"graft-runone-$name")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
    }
    spark.stop()
  }
}
