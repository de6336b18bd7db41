package graft

import java.nio.file.Files
import graft.ingest.SilverWriter
import org.apache.spark.sql.functions._

/** Bucketed-write co-location: two fact tables bucketed on the same key
  * must join (and aggregate on that key) with NO shuffle exchange — the
  * pay-the-shuffle-once-at-ingest contract the 100 TB design leans on.
  */
class BucketingSpec extends SparkSpec {

  test("equi-join of two same-bucketed tables plans without an Exchange") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-bucket")
    val orders = (1L to 500L).map(k => (k, s"o$k")).toDF("k", "o_payload")
    val items = (1L to 2000L).map(i => (i % 500 + 1, i)).toDF("k", "item_id")
    SilverWriter.writeBucketed(orders, "b_orders",
      base.resolve("o").toString, "k", buckets = 8)
    SilverWriter.writeBucketed(items, "b_items",
      base.resolve("i").toString, "k", buckets = 8)
    // disable auto-broadcast for the assertion: at test size Catalyst
    // prefers a broadcast join (fair enough), which bypasses bucketing —
    // the contract under test is the big-big case where broadcast is off
    // the table
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_items"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 2000)
      // groupBy on the bucket key rides the same distribution: no exchange
      val agg = spark.table("b_items").groupBy("k").agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }

  test("per-activity silver reads prune to the activity's partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").resolve("t").toString
    val rows = (1L to 50L).flatMap(a => (1 to 20).map(i => (a, i, i * 1.5)))
      .toDF("activity_id", "seq_no", "value")
    SilverWriter.upsertByPartition(rows, dir)
    val q = spark.read.parquet(dir).where(col("activity_id") === 7)
    val plan = q.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // NOT as a post-scan data filter over all partitions
    assert(plan.contains("PartitionFilters: [isnotnull(activity_id"),
      s"no partition pruning in:\n$plan")
    assert(q.count() === 20)
  }
}
