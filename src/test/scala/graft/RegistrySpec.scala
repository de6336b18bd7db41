package graft

/** Registry-level contract: every declared query planning + executing on the
  * smoke-scale data, name/oracle wiring consistent. Per-operator semantics
  * are covered by the DuckDB oracle gate (tools/check_oracle.py) and the
  * targeted specs; this is the cheap always-on net.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique and non-empty") {
    val names = SparkEntry.all.map(_.name)
    assert(names.nonEmpty)
    assert(names.distinct.size === names.size, "duplicate query names")
    assert(names.forall(_.startsWith("q_")), "query names use the q_ prefix")
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.all.flatMap { q =>
      try { q.fn(spark, sfDir).collect(); None }
      catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
