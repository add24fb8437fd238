package graft

/** Driver contract smoke: entry() returns rows on sf0.001 and every
  * declared query has an oracle or a documented rows-only reason. */
class EntrySmokeSpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; rows-only queries are the known set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert((q -- o) == Set("b9b_approx_distinct", "b15b_approx_quantiles",
        "b14b_topk_sketch", "b34_uniq_merge", "b37_quantile_merge",
        "b106_theta_diff"),
      s"unexpected rows-only queries: ${q -- o}")
  }
}
