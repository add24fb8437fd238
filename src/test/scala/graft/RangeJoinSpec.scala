package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("joinWithin finds exactly the pairs in [0, maxDelta], cell boundaries included") {
    val left = Seq((1L, "A", 100L), (2L, "A", 250L), (3L, "B", 100L))
      .toDF("l_id", "k", "l_t")
    val right = Seq(
      ("A", 99L, 10L),   // before left 1 -> no
      ("A", 100L, 11L),  // == t, delta 0 -> yes (1)
      ("A", 150L, 12L),  // delta 50 -> yes (1); 2's window starts at 250 -> no
      ("A", 200L, 13L),  // delta 100 == maxDelta -> yes (1)
      ("A", 201L, 14L),  // delta 101 -> no for 1; before 2 -> no
      ("A", 349L, 15L),  // delta 99 from 2 -> yes (2)
      ("B", 150L, 16L))  // other key -> yes for 3 only
      .toDF("k", "r_t", "r_id")
    val out = RangeJoin.joinWithin(left, right, "k", "k", "l_t", "r_t", maxDelta = 100L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 11L), (1L, 12L), (1L, 13L), (2L, 15L), (3L, 16L)))
  }

  test("bucketed join equals the naive theta join on a dense corpus") {
    val rows = (0L until 300L).map(i => (i, s"k${i % 3}", i * 7L % 1000L))
    val l = rows.toDF("l_id", "k", "l_t")
    val r = rows.map { case (id, k, t) => (k, t, id + 1000L) }.toDF("k", "r_t", "r_id")
    val fast = RangeJoin.joinWithin(l, r, "k", "k", "l_t", "r_t", maxDelta = 37L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.join(r.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("r_t") >= col("l_t") &&
          col("r_t") - col("l_t") <= 37L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast == naive && fast.nonEmpty)
  }
}
