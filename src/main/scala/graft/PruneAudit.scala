package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Partition-pruning evidence at replica scale: given a FLAT sf directory
  * and its date-partitioned rewrite (PartitionEvents), drives the actual
  * date-range query path (Tables.eventsInRange + q_time_range_stats)
  * against BOTH layouts and prints, per scan:
  *
  *   - the planned PartitionFilters (must be non-empty and name
  *     event_date on the partitioned layout),
  *   - files/partitions READ vs the table total (the 100 TB claim is that
  *     a 10-day range over a year-long log lists ~10/365 of the dirs),
  *   - result parity between the two layouts (collected + compared —
  *     the pruning must be invisible to query semantics).
  *
  * `runMain graft.PruneAudit <flatDir> <partitionedDir>`
  *
  * Developer evidence tooling (bench/PRUNE_*.txt); PlanAuditSpec pins the
  * same mechanics as a unit test on a temp fixture.
  */
object PruneAudit {
  private def scanInfo(df: DataFrame): (String, Long, Long) = {
    df.collect() // execute so scan metrics are final
    // AQE wraps any exchange-bearing plan in AdaptiveSparkPlanExec, whose
    // collect() does NOT descend into the adaptive subtree — unwrap to the
    // final physical plan first so this helper also works on aggregating
    // queries, not just the exchange-free eventsInRange path.
    val physical = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = physical.collect {
      case s: FileSourceScanExec => s
    }.headOption.getOrElse(sys.error(
      s"no FileSourceScanExec in plan:\n${physical.treeString}"))
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    (pf, scan.metrics("numFiles").value,
      scan.metrics.get("numPartitions").map(_.value).getOrElse(-1L))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PruneAudit <flatDir> <partitionedDir>")
    val Array(flat, part) = args
    val spark = GraftSession.build("graft-prune-audit")
    spark.sparkContext.setLogLevel("WARN")
    val from = "2024-01-10 00:00:00"
    val until = "2024-01-20 00:00:00"
    println(s"[prune] range [$from, $until) over $part vs flat $flat")

    val totalFiles = spark.read.parquet(s"$part/events.parquet").inputFiles.length
    val totalDays = spark.read.parquet(s"$part/events.parquet")
      .select(Tables.EventsPartCol).distinct().count()

    // the raw loader seam
    val ranged = Tables.eventsInRange(spark, part, from, until)
    val (pf, nFiles, nParts) = scanInfo(ranged)
    println(s"[prune] eventsInRange PartitionFilters: $pf")
    println(s"[prune] eventsInRange read $nFiles files / $nParts partitions " +
      s"of $totalFiles files / $totalDays day dirs")
    require(pf.contains(Tables.EventsPartCol),
      "partitioned layout planned NO partition filter")
    require(nFiles < totalFiles,
      s"no pruning: read $nFiles of $totalFiles files")

    // raw row-set parity: the pruned scan must return the EXACT same rows
    // as the flat layout (same predicate, fewer files listed)
    val rowsPart = ranged.collect().map(_.toString).sorted
    val rowsFlat = Tables.eventsInRange(spark, flat, from, until)
      .collect().map(_.toString).sorted
    require(rowsPart.sameElements(rowsFlat),
      s"row sets differ: ${rowsPart.length} vs ${rowsFlat.length}")
    println(s"[prune] eventsInRange row-set parity: true (${rowsPart.length} rows)")

    // the registered query that rides it, on both layouts. avg/stddev are
    // unordered double sums — the partitioned layout feeds rows in a
    // different order, so compare floats at the oracle gate's tolerance
    // (1e-6 relative), exact for the integer count.
    val qp = SparkEntry.queries("q_time_range_stats")(spark, part).collect()
    val qf = SparkEntry.queries("q_time_range_stats")(spark, flat).collect()
    require(qp.length == qf.length && qp.nonEmpty)
    val same = qp.zip(qf).forall { case (a, b) =>
      (0 until a.length).forall { i =>
        (a.get(i), b.get(i)) match {
          case (x: Double, y: Double) =>
            math.abs(x - y) <= 1e-6 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
          case (x, y) => x == y
        }
      }
    }
    println(s"[prune] q_time_range_stats parity flat vs partitioned: $same " +
      s"(${qp.length} rows; floats at 1e-6 rel — unordered double sums)")
    require(same, "partitioned layout changed query results beyond float noise")

    println(s"[prune] OK: pruned ${totalFiles - nFiles}/$totalFiles files, " +
      "results identical")
    spark.stop()
  }
}
