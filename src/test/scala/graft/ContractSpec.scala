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

  test("bench summary line stays far under the driver's stdout-tail budget") {
    val inv = """{"a":true,"b":true,"c":true,"d":true,"e":false}"""
    val line = Bench.summaryLine(12345.678901, 63, 0, 1.873421, inv,
      "/root/testdata/sf0.1", "/some/long/output/path/bench.json")
    assert(line.length < 1024, s"summary line too long (${line.length}B): $line")
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(!line.contains("\n"))
    // must carry the driver-contract fields
    Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
      "\"baseline_invariants\":", "\"sf\":").foreach(f =>
      assert(line.contains(f), s"missing $f in $line"))
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
