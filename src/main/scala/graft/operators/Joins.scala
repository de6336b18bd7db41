package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3).
  *
  * Covers the reference's join surface: plain equi joins
  * (db_reader.py:431-443, readers/fitness_curve.py:58-67), left-outer +
  * count-distinct + having (readers/performance.py:164-181), semi joins
  * (fitness_assessor.py:226-237), as-of / nearest-neighbour temporal joins
  * (analysis/running_economy.py:115-196, readers/physiology.py:193-219),
  * interval-containment joins (physiology.py:269-311), and top-k similarity
  * candidate selection (rag/queries/comparisons.py:205-267).
  *
  * Scale notes: the as-of/nearest joins here are the window-on-join
  * formulation with the small side broadcast — correct while one side is
  * broadcastable (the reference's weights/VO2 sides always are). At 100 TB
  * with two large sides the plan of record is a range-partitioned sort-merge
  * (partition both sides by key + coarse time bucket, merge within bucket);
  * SURVEY §4.2 reserves a custom SparkStrategy for that tier. Interval joins
  * use a broadcast of the filtered interval side; Catalyst plans a
  * BroadcastNestedLoop which is right when the interval side is small.
  */
object Joins {

  /** As-of backward join: for each left row, the single most recent right
    * row with rightTs <= leftTs and equal key. Deterministic tiebreak on
    * `rightTiebreak` descending.
    */
  def asofBackward(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      rightTiebreak: String): DataFrame = {
    val joined = left.join(broadcast(right),
      left(leftKey) === right(rightKey) && right(rightTs) <= left(leftTs))
    val w = Window.partitionBy(left.columns.map(left(_)): _*)
      .orderBy(right(rightTs).desc, right(rightTiebreak).desc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Nearest-neighbour temporal join: for each left row, the right row
    * minimizing |leftTs - rightTs| (key-equal), ties resolved to the past
    * side then by `rightTiebreak` ascending — mirroring the reference's
    * run↔weight matching (running_economy.py:115-196).
    */
  def nearestJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String, leftPk: String,
      rightTiebreak: String, maxGapSeconds: Option[Long] = None): DataFrame = {
    val gapSigned = unix_timestamp(right(rightTs)) - unix_timestamp(left(leftTs))
    val gap = abs(gapSigned)
    val cond0 = left(leftKey) === right(rightKey)
    val cond = maxGapSeconds.fold(cond0)(g => cond0 && gap <= g)
    val joined = left.join(broadcast(right), cond)
      .withColumn("gap_s", gap).withColumn("gap_signed", gapSigned)
    val w = Window.partitionBy(left(leftPk))
      .orderBy(col("gap_s"), col("gap_signed"), right(rightTiebreak))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "gap_signed")
  }

  // ---------------------------------------------------------------- queries

  val entries: Seq[Q] = Seq(
    Q("q_join_agg",
      """SELECT c.c_mktsegment, sum(o.o_totalprice) AS total_v,
        |  count(*) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum("o_totalprice").as("total_v"), count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    },

    Q("q_left_join_having",
      """SELECT c.c_custkey,
        |  count(DISTINCT o.o_orderstatus) AS n_status
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1 HAVING count(DISTINCT o.o_orderstatus) < 3
        |ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(countDistinct("o_orderstatus").as("n_status"))
        .filter(col("n_status") < 3)
        .orderBy("c_custkey")
    },

    Q("q_semi_join",
      """SELECT l_returnflag, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    Q("q_asof_backward",
      """SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate
        |FROM events e
        |JOIN orders o
        |  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |QUALIFY row_number() OVER (
        |  PARTITION BY e.event_id
        |  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "user_id", "ts")
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val joined = e.join(broadcast(o),
        o("o_custkey") === e("user_id") && o("o_orderdate") <= e("ts"))
      val w = Window.partitionBy(e("event_id"))
        .orderBy(o("o_orderdate").desc, o("o_orderkey").desc)
      joined.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(e("event_id"), e("user_id"), o("o_orderkey"), o("o_orderdate"))
        .orderBy("event_id")
    },

    Q("q_nearest_join",
      """SELECT o_orderkey, event_id, gap_s FROM (
        |  SELECT o.o_orderkey, e.event_id,
        |    abs(epoch_ms(e.ts)//1000 - epoch_ms(o.o_orderdate)//1000) AS gap_s,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY abs(epoch_ms(e.ts)//1000 - epoch_ms(o.o_orderdate)//1000),
        |        epoch_ms(e.ts)//1000 - epoch_ms(o.o_orderdate)//1000,
        |        e.event_id) AS rn
        |  FROM orders o JOIN events e ON e.user_id = o.o_custkey) t
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
      val e = Tables.events(s, d).select("event_id", "user_id", "ts")
      nearestJoin(o, e, "o_custkey", "user_id", "o_orderdate", "ts",
        "o_orderkey", "event_id")
        .select("o_orderkey", "event_id", "gap_s")
        .orderBy("o_orderkey")
    },

    // Interval/range join with a pushed-down aggregation: counting lineitem
    // rows per 30-day order window only needs the per-shipdate COUNTS, so
    // lineitem collapses 600k -> ~2.5k rows BEFORE the non-equi join. The
    // broadcast nested loop then touches orders x distinct-dates instead of
    // orders x lineitem (measured 122 s -> sub-second at sf0.1; at 100 TB
    // the same rewrite keeps the BNL side bounded by the date domain, which
    // grows with time, not data volume).
    Q("q_interval_join",
      """SELECT o.o_orderkey, count(l.l_orderkey) AS n_shipped
        |FROM (SELECT * FROM orders WHERE o_orderkey % 100 = 0) o
        |LEFT JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).filter(col("o_orderkey") % 100 === 0)
        .select("o_orderkey", "o_orderdate")
      val perDate = Tables.lineitem(s, d)
        .groupBy("l_shipdate").agg(count(lit(1)).as("cnt"))
      o.join(broadcast(perDate),
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= date_add(col("o_orderdate"), 30),
          "left_outer")
        .groupBy("o_orderkey")
        .agg(sum(coalesce(col("cnt"), lit(0L))).as("n_shipped"))
        .orderBy("o_orderkey")
    },

    Q("q_topk_similar",
      """SELECT o_orderkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY abs(o_totalprice - 150000.0) ASC, o_orderdate DESC,
        |  o_orderkey ASC
        |LIMIT 20""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .orderBy(abs(col("o_totalprice") - 150000.0).asc,
          col("o_orderdate").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(20)
    }
  )
}
