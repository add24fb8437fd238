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

  test("union-window as-of equals the naive max-per-left theta join on random data") {
    val rnd = new scala.util.Random(7)
    val left = (0L until 200L).map(i => (i, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
      .toDF("l_id", "k", "l_t")
    val right = (0L until 300L).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i, rnd.nextDouble()))
      .toDF("k", "r_t", "r_id", "v")
    val fast = AsOf.joinAsOf(left, right, "k", "k", "l_t", "r_t",
        rightVals = Seq("r_id" -> "asof_rid"), tieBreakR = Some("r_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("asof_rid"))) -1L else r.getAs[Long]("asof_rid"))).toMap
    // naive: all right rows <= t, keep max (r_t, r_id)
    val naive = left.join(right.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("r_t") <= col("l_t"), "left")
      .groupBy("l_id")
      .agg(max(struct(col("r_t"), col("r_id"))).as("best"))
      .collect().map { r =>
        val b = r.getStruct(1)
        r.getLong(0) -> (if (b == null || b.isNullAt(1)) -1L else b.getLong(1))
      }.toMap
    assert(fast == naive && fast.values.exists(_ >= 0))
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

  test("forward as-of picks the earliest right at or after; tolerance voids stale matches") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 140L), (3L, "A", 300L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 90L, 1L, 9.0), ("A", 150L, 2L, 15.0),
        ("A", 200L, 3L, 20.0))
      .toDF("sym", "t", "qid", "px")
    def run(tol: Option[Long]) =
      AsOf.joinAsOf(trades, quotes, "sym", "sym", "t", "t",
          rightVals = Seq("qid" -> "next_qid"), tieBreakR = Some("qid"),
          direction = "forward", tolerance = tol)
        .orderBy("trade_id").collect()
    val noTol = run(None)
    assert(noTol(0).getAs[Long]("next_qid") == 2L) // 150 is first ≥ 100
    assert(noTol(1).getAs[Long]("next_qid") == 2L)
    assert(noTol(2).isNullAt(noTol(2).fieldIndex("next_qid"))) // nothing ≥ 300
    val tol = run(Some(40L))
    assert(tol(0).isNullAt(tol(0).fieldIndex("next_qid"))) // 150−100 > 40
    assert(tol(1).getAs[Long]("next_qid") == 2L)           // 150−140 ≤ 40
  }

  test("forward as-of matches an equal-time right row") {
    val trades = Seq((1L, "A", 150L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 150L, 7L, 1.5)).toDF("sym", "t", "qid", "px")
    val out = AsOf.joinAsOf(trades, quotes, "sym", "sym", "t", "t",
        rightVals = Seq("qid" -> "next_qid"), tieBreakR = Some("qid"),
        direction = "forward").collect()
    assert(out(0).getAs[Long]("next_qid") == 7L)
  }
}
