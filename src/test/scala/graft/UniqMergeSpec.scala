package graft

import org.apache.spark.sql.functions._

/** b34's correctness story (rows-only at the driver): DataSketches
  * HLL states merged across parts must equal the direct single-pass
  * sketch, and land ε-close to the exact distinct count. */
class UniqMergeSpec extends SparkSpec {
  import spark.implicits._

  test("merged per-part HLL states == direct sketch, ε-close to exact") {
    // 3 groups × overlapping user ranges; some users span parts so the
    // merge has real work to do (not a disjoint-union special case)
    val rows = (0 until 3000).map { i =>
      (i.toLong, s"t${i % 3}", (i % 700).toLong)
    }
    val df = rows.toDF("event_id", "event_type", "user_id")

    val parts = (0 to 2).map(p =>
      df.filter(pmod(col("event_id"), lit(3)) === p)
        .groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("st")))
    val merged = parts.reduce(_.unionByName(_))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("st"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val direct = df.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // merge must lose nothing vs the one-pass sketch (register-identical
    // in this sparse/coupon regime; see the dense-regime test below)
    assert(merged === direct)
    // and the sketch itself is within HLL error of exact (lgK=12 → ~1.6%·3σ)
    exact.foreach { case (t, n) =>
      val est = merged(t).toDouble
      assert(math.abs(est - n) / n < 0.05,
        s"$t: estimate $est too far from exact $n")
    }
  }

  test("dense regime: merged within 1% of direct, both within ε of exact") {
    // 6000 distinct pushes lgK=12 HLL into dense mode, where the
    // union's HLL_8 target re-estimates a hair apart from the direct
    // HLL_4 sketch (b34's merged_close_direct bound: max(2, 1%·exact))
    val rows = (0 until 18000).map(i => (i.toLong, (i % 6000).toLong))
    val df = rows.toDF("event_id", "user_id")
    val parts = (0 to 2).map(p =>
      df.filter(pmod(col("event_id"), lit(3)) === p)
        .agg(hll_sketch_agg(col("user_id")).as("st")))
    val merged = parts.reduce(_.unionByName(_))
      .agg(hll_sketch_estimate(hll_union_agg(col("st"))).as("est"))
      .collect()(0).getLong(0)
    val direct = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)
    assert(math.abs(merged - direct) <= math.max(2.0, 0.01 * 6000),
      s"merged $merged vs direct $direct")
    Seq(merged, direct).foreach { est =>
      assert(math.abs(est - 6000.0) / 6000 < 0.05, s"estimate $est vs 6000")
    }
  }
}
