package graft

import graft.functions.TextHash._
import org.apache.spark.sql.functions._

/** The dual-dialect hash fragments are the parity foundation for the whole
  * dedup/fingerprint tier — pin their Spark-side semantics to values
  * cross-checked against DuckDB (see TextHash scaladoc).
  */
class TextHashSpec extends SparkSpec {

  private def eval1(sqlExpr: String): Any =
    spark.sql(s"SELECT $sqlExpr AS v").first().get(0)

  test("polyHash matches the DuckDB-verified fold values") {
    // (0*31+97)%P=97; (97*31+98)%P=3105 — same values DuckDB computes
    assert(eval1(polySpark("'a'")) === 97L)
    assert(eval1(polySpark("'ab'")) === 3105L)
    assert(eval1(polySpark("''")) === 0L)
  }

  test("tokens: trims, splits on runs of whitespace, drops empties") {
    val out = eval1(s"${tokensSpark("'  a  b\\tc  '")}")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(out === Seq("a", "b", "c"))
  }

  test("shingles: <3 tokens yields empty, distinct 3-gram windows otherwise") {
    assert(eval1(s"size(${shinglesSpark("array('a','b')")})") === 0)
    val sh = eval1(shinglesSpark("array('a','b','c','d')"))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh === Seq("a b c", "b c d"))
    // duplicated window collapses
    val dup = eval1(s"size(${shinglesSpark("array('a','b','a','b','a','b')")})")
    assert(dup === 2) // "a b a" and "b a b"
  }

  test("minhash permutation constants are distinct") {
    val perms = (0 until 16).map(j => (A(j), B(j)))
    assert(perms.distinct.size === 16)
  }
}
