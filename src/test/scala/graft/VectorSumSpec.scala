package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

/** [[graft.plans.VectorSumLong]] — the moment-matrix accumulator
  * behind c96: must be exactly the posexplode+groupBy sum under every
  * partitioning (merge path included), and tolerant of ragged input. */
class VectorSumSpec extends SparkSpec {
  import spark.implicits._

  test("equals the exploded groupBy sum under any partitioning") {
    val rows = (0 until 500).map { i =>
      (i % 7).toLong -> Array.tabulate(16)(j => (i * 31 + j * 17 - 200).toLong)
    }
    val df = rows.toDF("k", "v")
    for (parts <- Seq(1, 4, 13)) {
      val got = df.repartition(parts)
        .groupBy(col("k")).agg(Fns.vecSumLong(col("v")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = df.select(col("k"), posexplode(col("v")).as(Seq("p", "x")))
        .groupBy(col("k"), col("p")).agg(sum(col("x")).as("s"))
        .collect().groupBy(_.getLong(0))
        .map { case (k, rs) =>
          k -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
      assert(got == want, s"mismatch at $parts partitions")
    }
  }

  test("ragged arrays: shorter rows pad with zero, nulls are skipped") {
    val df = Seq(
      (1L, Some(Seq(1L, 2L, 3L))),
      (1L, Some(Seq(10L))),
      (1L, None),
      (2L, Some(Seq.empty[Long]))
    ).toDF("k", "v")
    val got = df.groupBy(col("k")).agg(Fns.vecSumLong(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(11L, 2L, 3L))
    assert(got(2L) == Seq.empty[Long])
  }

  test("c96's in-row pair products index the upper triangle correctly") {
    // one vector with distinct primes → every pair product unique, so
    // the row-major order (diagonal included) is checkable; the native
    // codegen'd expression must equal the composed HOF form
    val q = Seq(2L, 3L, 5L, 7L)
    val row = Seq(q).toDF("q")
      .select(Fns.upperTriangleProducts(col("q")).as("pp"),
        flatten(transform(col("q"), (x, i) =>
          transform(slice(col("q"), i + 1, size(col("q")) - i),
            y => x * y))).as("hof"))
      .collect().head
    val pp = row.getSeq[Long](0)
    assert(pp == Seq(4L, 6L, 10L, 14L, 9L, 15L, 21L, 25L, 35L, 49L))
    assert(pp == row.getSeq[Long](1), "native and HOF forms must agree")
    // the (i,j) → flat-index formula used by c96 (1-based, d=4)
    def idx(i: Int, j: Int, d: Int) = (i - 1) * d - (i - 1) * (i - 2) / 2 + (j - i)
    assert(pp(idx(1, 3, 4)) == 10L) // q1*q3
    assert(pp(idx(2, 2, 4)) == 9L)  // diagonal
    assert(pp(idx(3, 4, 4)) == 35L)
    // empty input → empty triangle (not a crash)
    assert(Seq(Seq.empty[Long]).toDF("q")
      .select(Fns.upperTriangleProducts(col("q"))).collect()
      .head.getSeq[Long](0).isEmpty)
  }
}
