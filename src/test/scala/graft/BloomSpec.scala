package graft

import org.apache.spark.sql.functions._

/** Contract tests for the bloom pre-join seam (functions.Bloom): the
  * guarantee the decontamination plan rests on is NO false negatives —
  * a dropped true candidate would silently change exact results.
  */
class BloomSpec extends SparkSpec {

  test("every inserted key passes the membership probe (no false negatives)") {
    import spark.implicits._
    val keys = (1L to 2000L).map(_ * 2654435761L) // spread across the space
    val df = keys.toDF("k")
    val bf = functions.Bloom.buildFilter(df, expectedItems = 4096, numBits = 1L << 16).get
    assert(bf.length <= (1 << 16) / 8 + 64, s"filter unexpectedly large: ${bf.length}")
    val misses = df.where(!functions.Bloom.mightContain(bf, col("k"))).count()
    assert(misses === 0L)
  }

  test("an unrelated key population is mostly rejected (filter is selective)") {
    import spark.implicits._
    val inserted = (1L to 1000L).toDF("k")
    val bf = functions.Bloom.buildFilter(inserted, 4096, 1L << 16).get
    val probes = (1000001L to 1010000L).toDF("k")
    val passed = probes.where(functions.Bloom.mightContain(bf, col("k"))).count()
    // fp rate at this sizing is << 1%; 5% is a generous flake guard
    assert(passed < 500L, s"false-positive rate too high: $passed / 10000")
  }

  test("empty key frame yields no filter (SQL NULL aggregate)") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k")
    assert(functions.Bloom.buildFilter(empty, 4096, 1L << 16).isEmpty)
  }
}
