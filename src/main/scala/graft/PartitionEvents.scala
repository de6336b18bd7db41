package graft

import org.apache.spark.sql.functions._

/** Rewrites an sf directory's events table into the date-partitioned
  * layout a production event log has (events.parquet/event_date=…/part-*),
  * leaving every other table untouched as a plain copy. The partition
  * column is derived as date(ts) — wall-clock NTZ date, matching the
  * eventsInRange derived-predicate contract (Tables.scala) — so a
  * date-range query against the rewritten directory prunes to exactly the
  * in-range day directories instead of scanning the full log.
  *
  * `runMain graft.PartitionEvents <inDir> <outDir>`
  *
  * Developer tooling for the pruning evidence run (PlanAuditSpec asserts
  * the same mechanics on a temp fixture); the engine code itself is
  * layout-agnostic — Tables presents the identical schema either way.
  */
object PartitionEvents {
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PartitionEvents <inDir> <outDir>")
    val Array(inDir, outDir) = args
    val spark = GraftSession.build("graft-partition-events")
    spark.sparkContext.setLogLevel("WARN")
    tables.foreach { t =>
      spark.read.parquet(s"$inDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    val ev = spark.read.parquet(s"$inDir/events.parquet")
    // to_date on the stored NTZ column is a pure wall-clock date — no
    // session-zone dependence; one day per directory. Sort within
    // partitions by ts so each day's row groups carry tight ts min/max
    // stats (row-group skipping inside a day, on top of dir pruning).
    ev.withColumn(Tables.EventsPartCol, to_date(col("ts")))
      .repartition(col(Tables.EventsPartCol))
      .sortWithinPartitions("ts")
      .write.mode("overwrite")
      .partitionBy(Tables.EventsPartCol)
      .parquet(s"$outDir/events.parquet")
    val days = spark.read.parquet(s"$outDir/events.parquet")
      .select(Tables.EventsPartCol).distinct().count()
    System.err.println(s"[partition-events] events written as $days day dirs")
    spark.stop()
  }
}
