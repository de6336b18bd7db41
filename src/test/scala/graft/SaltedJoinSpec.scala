package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** Salted-join semantics on a deliberately skewed frame — the oracle
  * proves result-parity on real data; this pins the two properties the
  * oracle can't see: the salt actually spreads a hot key, and the helper
  * leaks no plumbing column.
  */
class SaltedJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a 90%-hot-key frame") {
    import spark.implicits._
    // 900 rows on key 1 (hot), 100 spread over keys 2..11
    val big = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => ((i % 10 + 2).toLong, (900 + i).toLong)))
      .toDF("k", "row_id")
    val small = (1L to 11L).map(k => (k, s"dim$k")).toDF("k", "payload")
    val salted = Joins.saltedJoin(big, small, Seq("k"),
      buckets = 4, saltBy = xxhash64(col("row_id")))
    val plain = big.join(small, Seq("k"))
    assert(salted.columns.toSeq === plain.columns.toSeq) // no __salt leak
    assert(salted.count() === 1000)
    val s = salted.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val p = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(s === p)
  }

  test("a hot key's rows actually spread across salt buckets") {
    import spark.implicits._
    val big = (1 to 400).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val nBuckets = big
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(4)))
      .select("__salt").distinct().count()
    assert(nBuckets === 4) // all four buckets hit -> 4-way parallelism
  }
}
