package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-join pruning — the 100 TB candidate-generation pattern
  * Spark itself uses for runtime row-group filtering (`BloomFilterAggregate`
  * / `BloomFilterMightContain` are built-in Catalyst expressions, registered
  * internal-only, so this module is the thin public seam — the same
  * Column⇄Expression bridge discipline as the array kernels).
  *
  * Shape: build ONE bloom filter over the small side's join keys (size
  * fixed by `numBits`, independent of the big side), ship it as a literal
  * into a scan-side predicate on the big side, and let the exact join
  * verify the survivors. False positives cost only wasted verification;
  * false negatives are impossible, so the final result is byte-identical
  * to the unfiltered plan — which is what keeps the DuckDB oracle exact.
  *
  * Used by q_decontaminate_bloom (Dedup.scala): benchmark-overlap
  * decontamination where the training postings stream is pruned at the
  * scan by the benchmark's bloom instead of flowing whole into the join.
  */
object Bloom {

  /** Aggregate a BIGINT key column into one serialized bloom filter
    * (BINARY). `expectedItems` sizes the hash count, `numBits` pins the
    * filter size — both foldable, so the filter's memory footprint is a
    * declared constant, not data-dependent.
    */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(key),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())

  /** Membership probe of a BIGINT key against a pre-built serialized
    * filter (ships to executors as a literal — bounded by `numBits`, the
    * broadcast-a-sketch analog of broadcasting a dimension).
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    GraftBridge.column(
      BloomFilterMightContain(
        Literal(filter, BinaryType),
        GraftBridge.expression(key)))

  /** Build the serialized filter from a single-column BIGINT frame. One
    * bounded driver round-trip: the result is `numBits/8` bytes by
    * construction regardless of row count (None when the frame is empty —
    * the aggregate returns SQL NULL with zero rows).
    */
  def buildFilter(keys: DataFrame, expectedItems: Long,
      numBits: Long): Option[Array[Byte]] = {
    val row = keys
      .agg(bloomAgg(keys.columns.headOption.map(org.apache.spark.sql.functions.col)
        .getOrElse(org.apache.spark.sql.functions.col("value")), expectedItems, numBits).as("bf"))
      .head()
    Option(row.getAs[Array[Byte]](0))
  }
}
