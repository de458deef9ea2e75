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
    // worst realistic case: MANY regressed queries with long names —
    // the name list must cap at 5 so the line can't blow the budget
    val regressed = (1 to 40).map(i => f"q$i%02d_some_long_query_name_here")
    val line = Bench.summaryLine(12345.678901, 63, 0, 1.873421, regressed, inv,
      "/root/testdata/sf0.1", "/some/long/output/path/bench.json")
    assert(line.length < 1024, s"summary line too long (${line.length}B): $line")
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(!line.contains("\n"))
    // must carry the driver-contract fields
    Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"",
      "\"regressions_n\":40", "\"regressions\":[",
      "\"baseline_invariants\":", "\"sf\":").foreach(f =>
      assert(line.contains(f), s"missing $f in $line"))
    // exactly 5 names survive the cap
    assert(line.split("some_long_query_name_here").length - 1 == 5)
    // clean run: empty list, zero count
    val clean = Bench.summaryLine(60.0, 82, 0, 1.1, Nil, inv, "sf", "out")
    assert(clean.contains("\"regressions_n\":0") &&
      clean.contains("\"regressions\":[]"))
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
