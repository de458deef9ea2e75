package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself, so a refactor can't silently
  * break the smoke check or orphan an oracle. */
class ContractSpec extends AnyFunSuite {

  test("entry() returns rows on sf0.001 (the driver smoke)") {
    assert(SparkEntry.entry(TestSpark.session).count() > 0)
  }

  test("every oracle key names a registered query; keys are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    qs.foreach(k => assert(k.matches("[a-z][a-z0-9_]+"), s"odd key: $k"))
  }

  test("oracle SQL is single-statement and DuckDB-parameter-free") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains(";"), s"$k: multi-statement oracle")
      assert(!sql.contains("?"), s"$k: parameter placeholder in oracle")
      assert(sql.trim.toUpperCase.startsWith("WITH") ||
        sql.trim.toUpperCase.startsWith("SELECT"), s"$k: not a query")
    }
  }
}
