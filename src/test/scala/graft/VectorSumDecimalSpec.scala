package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

/** vec_sum_dec must be BIT-identical to the posexplode +
  * sum(CAST(x AS DECIMAL(28,12))) form it replaces — same double→
  * decimal conversion (shortest-decimal, HALF_UP to scale 12), exact
  * addition, any partitioning. */
class VectorSumDecimalSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = (0L until 97L).map { i =>
    (i % 5, Array(0.1 * i, -2.7182818284590455 * (i % 7),
      1e-13 * i, 1.0 / (i + 1)))
  }.toDF("g", "v").repartition(7) // force multi-partition merges

  test("bit-identical to the exploded decimal-sum form, per group") {
    val viaAgg = vecs.groupBy(col("g"))
      .agg(Fns.vecSumDec(col("v")).as("s"))
      .select(col("g"), posexplode(col("s")).as(Seq("pos", "x")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        r.getDecimal(2).stripTrailingZeros).toMap
    val viaExplode = vecs
      .select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("g"), col("pos"))
      .agg(sum(col("x").cast("decimal(28,12)")).as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        r.getDecimal(2).stripTrailingZeros).toMap
    assert(viaAgg === viaExplode)
    assert(viaAgg.nonEmpty)
  }

  test("null vectors contribute nothing; empty group sums to empty array") {
    val withNulls = Seq((1L, Array(1.5, 2.5)), (1L, null.asInstanceOf[Array[Double]]))
      .toDF("g", "v")
    val got = withNulls.groupBy(col("g")).agg(Fns.vecSumDec(col("v")).as("s"))
      .collect()(0).getSeq[java.math.BigDecimal](1)
    assert(got.map(_.doubleValue).toSeq == Seq(1.5, 2.5))
  }
}
