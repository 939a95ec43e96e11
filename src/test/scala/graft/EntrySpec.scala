package graft

/** Driver-contract smoke: entry() rows>0; every query has consistent wiring. */
class EntrySpec extends SparkSuite {

  test("entry returns non-empty severity aggregates") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("ERROR", "WARN", "INFO")))
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("every query key has an oracle or is documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("all queries run and are non-degenerate at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val emptyOk = Set("q_dedup_jaccard") // near-dup pair may not exist at tiny sf
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n >= 0, s"$name failed")
      if (!emptyOk(name)) assert(n > 0, s"$name degenerate (0 rows) at sf0.001")
    }
  }
}
