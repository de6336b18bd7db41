package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{
  GlobalLimit, LocalLimit, LogicalPlan, Offset, Project, Sort}

/** ORDER-BY-totality net — the permanent form of the ×100 sweep that
  * caught q_heat_cost and q_rating_labels in round 12 (both sorted on
  * non-unique keys; tie order is engine- and partitioning-dependent, so
  * the bug is invisible at one scale and a hash mismatch at another).
  *
  * The driver's correctness hash is ORDER-sensitive, so every registered
  * query's final ORDER BY must be total in the only sense that matters:
  * rows that tie on the full sort key must be identical in every output
  * column. Two tiers, chosen per query from its analyzed plan:
  *
  *  1. Sort keys all visible in the output (the shape every historical
  *     offender had): deterministic check — group by the key columns and
  *     assert no group holds more than one distinct full row. A revert of
  *     either r12 fix fails here.
  *  2. Sort keys hidden behind the final projection (the r12 fixes
  *     deliberately sort on source tiebreakers BEFORE projecting): the
  *     key columns are gone from the output, so assert the observable
  *     consequence instead — the collected row SEQUENCE is invariant
  *     under a different shuffle-partition count (ties, if any mattered,
  *     reorder when the sort's partitioning changes). Floats compare at
  *     the oracle gate's 1e-6 relative tolerance; order swaps show up as
  *     whole-row mismatches far beyond it.
  *
  * Queries with no global Sort at the root produce either one row or an
  * order the driver never hashes order-sensitively — nothing to pin.
  */
class SortTotalitySpec extends SparkSpec {

  /** Topmost global Sort, looking through the projection/limit wrappers a
    * DataFrame query ends with.
    */
  private def finalSort(p: LogicalPlan): Option[Sort] = p match {
    case s: Sort if s.global => Some(s)
    case pr: Project => finalSort(pr.child)
    case l: GlobalLimit => finalSort(l.child)
    case l: LocalLimit => finalSort(l.child)
    case o: Offset => finalSort(o.child) // .offset(n).limit(k) paging
    case _ => None
  }

  private def sameValue(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) ||
        math.abs(x - y) <= 1e-6 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (x: Float, y: Float) => sameValue(x.toDouble, y.toDouble)
    case (x, y) => x == y || String.valueOf(x) == String.valueOf(y)
  }

  test("every final ORDER BY is total (ties identical in all output columns)") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    var nExact, nStability, nUnsorted = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val analyzed = df.queryExecution.analyzed
      finalSort(analyzed) match {
        case None => nUnsorted += 1
        case Some(sort) =>
          val out = analyzed.output
          val keyAttrs = sort.order.map(_.child).collect {
            case a: AttributeReference if out.exists(_.exprId == a.exprId) => a
          }
          val namesUnique = out.map(_.name).distinct.size == out.size
          if (keyAttrs.size == sort.order.size && namesUnique) {
            // tier 1: exact — group by the visible keys, no group may hold
            // two distinct full rows
            nExact += 1
            val keyNames = keyAttrs
              .map(a => out.find(_.exprId == a.exprId).get.name).distinct
            val viol = df
              .groupBy(keyNames.map(col): _*)
              .agg(countDistinct(struct(df.columns.map(col): _*)).as("nv"))
              .where(col("nv") > 1)
              .count()
            if (viol > 0)
              offenders += s"$name: $viol sort-key group(s) " +
                s"[${keyNames.mkString(", ")}] hold non-identical rows"
          } else {
            // tier 2: stability — the collected sequence must not move
            // when the sort's shuffle partitioning changes
            nStability += 1
            val r1 = df.collect()
            val prev = spark.conf.get("spark.sql.shuffle.partitions")
            val r2 = try {
              spark.conf.set("spark.sql.shuffle.partitions", "13")
              fn(spark, sfDir).collect()
            } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
            if (r1.length != r2.length)
              offenders += s"$name: row count moved with partitioning " +
                s"(${r1.length} vs ${r2.length})"
            else {
              val bad = r1.iterator.zip(r2.iterator).zipWithIndex.collectFirst {
                case ((a, b), i) if !(0 until a.length).forall(j =>
                  sameValue(a.get(j), b.get(j))) => i
              }
              bad.foreach(i => offenders +=
                s"$name: row order moved with partitioning at row $i " +
                  s"(${r1(i)} vs ${r2(i)})")
            }
          }
      }
    }
    info(s"checked: $nExact exact-key, $nStability stability, " +
      s"$nUnsorted unsorted/1-row")
    assert(offenders.isEmpty,
      "non-total final ORDER BY (tie order is engine/partitioning-" +
        s"dependent — add tiebreakers):\n${offenders.mkString("\n")}")
    // the net itself must keep covering both tiers: the r12 offenders
    // live in tier 2 after their fixes, and any revert lands in tier 1
    assert(nExact > 0 && nStability > 0)
  }
}
