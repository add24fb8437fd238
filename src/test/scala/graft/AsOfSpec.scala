package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right row at or before each left time") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 90L, 10.0), ("A", 100L, 11.0), ("A", 200L, 12.0),  // t=100: exact match wins
      ("B", 60L, 99.0))                                         // after B's trade: no match
      .toDF("sym", "t", "px")
    val out = AsOf.joinAsOf(trades, quotes, "sym", "sym", "t", "t",
        rightVals = Seq("px" -> "asof_px", "t" -> "asof_t"))
      .orderBy("trade_id").collect()
    assert(out(0).getAs[Double]("asof_px") == 11.0) // t=100 includes equal time
    assert(out(0).getAs[Long]("asof_t") == 100L)
    assert(out(1).getAs[Double]("asof_px") == 12.0) // latest ≤ 205
    assert(out(2).isNullAt(out(2).fieldIndex("asof_px"))) // nothing ≤ 50 for B
  }

  test("ties on (key, time) resolve by the tie-break column, deterministically") {
    val left = Seq((1L, "A", 100L)).toDF("id", "k", "t")
    val right = Seq(("A", 100L, 7L, 1.0), ("A", 100L, 9L, 2.0), ("A", 100L, 8L, 3.0))
      .toDF("k", "t", "rid", "v")
    val out = AsOf.joinAsOf(left, right, "k", "k", "t", "t",
      rightVals = Seq("v" -> "asof_v", "rid" -> "asof_rid"),
      tieBreakR = Some("rid")).collect()
    assert(out(0).getAs[Long]("asof_rid") == 9L) // highest tie-break wins
    assert(out(0).getAs[Double]("asof_v") == 2.0)
  }
}
