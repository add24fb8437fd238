package graft

/** Driver contract smoke: entry() returns rows on sf0.001 and every
  * declared query has an oracle or a documented rows-only reason. */
class EntrySmokeSpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys and query keys coincide exactly — zero rows-only queries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    // Since round 8 the sketch queries emit exact values + in-query
    // ε-contract flags, so every query is fully driver-checkable.
    assert((q -- o).isEmpty, s"queries without oracles: ${q -- o}")
  }
}
