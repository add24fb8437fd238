package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** b107's histogram-form Gini against the textbook rank form, computed
  * independently in the test over the same table — the tie-collapse
  * identity (Σ rank·x is permutation-invariant within a tied value)
  * is the part worth pinning, and the oracle gate re-pins it in SQL. */
class GiniSpec extends SparkSpec {

  test("b107 histogram Gini == rank-window Gini on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("b107_gini")(spark, dir).collect()(0)
    val perUser = graft.sources.Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    val ranked = perUser.withColumn("rn",
      row_number().over(Window.orderBy(col("cents"), col("user_id"))))
      .select(col("cents"), col("rn")).collect()
    val n = BigInt(ranked.length)
    val t = ranked.map(r => BigInt(r.getAs[Long]("cents"))).sum
    val s = ranked.map(r =>
      BigInt(r.getAs[Int]("rn")) * r.getAs[Long]("cents")).sum
    val expected = (s * 2 - (n + 1) * t) * 1000000 / (n * t)
    assert(got.getAs[Long]("n_users") === n.toLong)
    assert(got.getAs[Long]("total_cents") === t.toLong)
    assert(got.getAs[Long]("gini_ppm") === expected.toLong)
    // sanity: a real revenue distribution is neither uniform nor
    // degenerate — the index must land strictly inside (0, 1)
    assert(got.getAs[Long]("gini_ppm") > 0L &&
      got.getAs[Long]("gini_ppm") < 1000000L)
  }
}
