package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

/** Funnel/retention/sequenceMatch on hand-built chains — the sf data is
  * dense enough that nearly every user funnels to level 3, so window
  * expiry, ordering, and partial chains are exercised here. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L // window span in ts units

  private def funnel(rows: Seq[(Long, Long, Long, String)]): Map[Long, Long] = {
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    Funnel.windowFunnel(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "s", col("event_type") === "c",
          col("event_type") === "p"),
        windowSpan = W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("strict_order funnel and sequenceMatchTime match brute-force references on random streams") {
    val rnd = new scala.util.Random(7)
    val types = Array("s", "c", "p", "x", "y")
    for (trial <- 0 until 8) {
      val rows = (0 until 40).map { i =>
        (rnd.nextInt(3).toLong, i.toLong + 1, rnd.nextInt(300).toLong,
          types(rnd.nextInt(types.length))) }
      val byUser = rows.groupBy(_._1).map { case (u, es) =>
        u -> es.sortBy(e => (e._3, e._2)) } // (ts, event_id) order
      // brute-force strict_order: best consecutive-run prefix length
      val refLevels = byUser.map { case (u, es) =>
        val best = (for {
          i <- es.indices
          lp <- 1 to math.min(3, es.length - i)
          if (0 until lp).forall(k => es(i + k)._4 == Seq("s", "c", "p")(k))
          if es(i + lp - 1)._3 - es(i)._3 <= W
        } yield lp) :+ 0
        u -> best.max.toLong
      }
      val df = rows.toDF("user_id", "event_id", "ts", "event_type")
      assert(strictFunnel(rows) == refLevels, s"trial $trial strict_order")
      // brute-force sequenceMatchTime over the filtered subsequence
      val refMatches = byUser.map { case (u, es) =>
        val f = es.filter(e => e._4 == "s" || e._4 == "p")
        u -> f.zip(f.drop(1)).count { case (a, b) =>
          a._4 == "s" && b._4 == "p" && b._3 - a._3 < W }.toLong
      }
      val got = Funnel.sequenceMatchTime(df, "user_id", "ts", "event_id",
          col("event_type") === "s", col("event_type") === "p", maxGap = W)
        .collect().map(r => r.getAs[Long]("user_id") ->
          r.getAs[Long]("n_matches")).toMap
      assert(got == refMatches, s"trial $trial sequenceMatchTime")
    }
  }

  test("sequenceMatchTime: adjacency over the matched subsequence, exclusive gap bound") {
    val rows = Seq(
      // user 1: s at 0, noise at 10 (not a condition — must NOT break
      // adjacency), p at 50 (gap 50 < 100) → matched
      (1L, 1L, 0L, "s"), (1L, 2L, 10L, "x"), (1L, 3L, 50L, "p"),
      // user 2: s at 0, p at exactly 100 — gap == bound is EXCLUDED
      (2L, 4L, 0L, "s"), (2L, 5L, 100L, "p"),
      // user 3: s at 0, another s at 20 (condition event — breaks the
      // first pair), p at 60: pair (s@20, p@60) matches
      (3L, 6L, 0L, "s"), (3L, 7L, 20L, "s"), (3L, 8L, 60L, "p"),
      // user 4: p before s only → no match
      (4L, 9L, 0L, "p"), (4L, 10L, 50L, "s"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Funnel.sequenceMatchTime(rows, "user_id", "ts", "event_id",
        col("event_type") === "s", col("event_type") === "p", maxGap = 100L)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Int]("matched"), r.getAs[Long]("n_matches"))).toMap
    assert(out(1L) == ((1, 1L)))
    assert(out(2L) == ((0, 0L)))
    assert(out(3L) == ((1, 1L)))
    assert(out(4L) == ((0, 0L)))
  }

  private def strictFunnel(rows: Seq[(Long, Long, Long, String)]): Map[Long, Long] = {
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    Funnel.windowFunnelStrictOrder(df, "user_id", "ts", "event_id",
        Seq(col("event_type") === "s", col("event_type") === "c",
          col("event_type") === "p"),
        windowSpan = W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("strict order: consecutive chain reaches level 3") {
    assert(strictFunnel(Seq(
      (1L, 1L, 10L, "s"), (1L, 2L, 50L, "c"), (1L, 3L, 100L, "p")))
      === Map(1L -> 3L))
  }

  test("strict order: any intervening event kills the chain") {
    // s, c, OTHER, p: default mode would reach 3, strict stops at 2
    assert(strictFunnel(Seq(
      (1L, 1L, 10L, "s"), (1L, 2L, 20L, "c"),
      (1L, 3L, 30L, "x"), (1L, 4L, 40L, "p"))) === Map(1L -> 2L))
    // s, OTHER, c, p: strict stops at 1
    assert(strictFunnel(Seq(
      (2L, 1L, 10L, "s"), (2L, 2L, 20L, "x"),
      (2L, 3L, 30L, "c"), (2L, 4L, 40L, "p"))) === Map(2L -> 1L))
  }

  test("strict order: window still measured from chain start") {
    // consecutive but p lands past W from s -> level 2
    assert(strictFunnel(Seq(
      (1L, 1L, 0L, "s"), (1L, 2L, 60L, "c"), (1L, 3L, 120L, "p")))
      === Map(1L -> 2L))
  }

  test("strict order: best run wins among several starts") {
    // broken run then a clean consecutive run later
    assert(strictFunnel(Seq(
      (1L, 1L, 0L, "s"), (1L, 2L, 10L, "x"),
      (1L, 3L, 20L, "s"), (1L, 4L, 30L, "c"), (1L, 5L, 40L, "p")))
      === Map(1L -> 3L))
  }

  private def seqCount(rows: Seq[(Long, Long, Long, String)]): Map[Long, Long] = {
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    Funnel.sequenceCount2(df, "user_id", "ts", "event_id",
        cond1 = col("event_type") === "p", cond2 = col("event_type") === "e")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sequenceCount: non-overlapping FSM matches") {
    // p e p e -> 2; p p e e -> 1 (second e finds no new p);
    // e p e -> 1 (leading e never arms); p alone -> 0
    assert(seqCount(Seq(
      (1L, 1L, 10L, "p"), (1L, 2L, 20L, "e"),
      (1L, 3L, 30L, "p"), (1L, 4L, 40L, "e"))) === Map(1L -> 2L))
    assert(seqCount(Seq(
      (2L, 1L, 10L, "p"), (2L, 2L, 20L, "p"),
      (2L, 3L, 30L, "e"), (2L, 4L, 40L, "e"))) === Map(2L -> 1L))
    assert(seqCount(Seq(
      (3L, 1L, 10L, "e"), (3L, 2L, 20L, "p"), (3L, 3L, 30L, "e")))
      === Map(3L -> 1L))
    assert(seqCount(Seq((4L, 1L, 10L, "p"))) === Map(4L -> 0L))
  }

  test("sequenceCount: other event types are transparent to .*") {
    // p x x e matches once — the intervening x's are .* filler
    assert(seqCount(Seq(
      (1L, 1L, 10L, "p"), (1L, 2L, 20L, "x"),
      (1L, 3L, 30L, "x"), (1L, 4L, 40L, "e"))) === Map(1L -> 1L))
  }

  test("full chain within window reaches level 3") {
    assert(funnel(Seq((1L, 1L, 10L, "s"), (1L, 2L, 50L, "c"), (1L, 3L, 100L, "p")))
      === Map(1L -> 3L))
  }

  test("window measured from chain START, not previous step") {
    // s@0, c@90, p@150: p is 60 after c but 150 > W after s -> level 2.
    assert(funnel(Seq((1L, 1L, 0L, "s"), (1L, 2L, 90L, "c"), (1L, 3L, 150L, "p")))
      === Map(1L -> 2L))
  }

  test("a later restart rescues an expired chain") {
    // First signup expires, second signup@100 starts a fresh chain.
    assert(funnel(Seq(
      (1L, 1L, 0L, "s"), (1L, 2L, 100L, "s"),
      (1L, 3L, 150L, "c"), (1L, 4L, 190L, "p"))) === Map(1L -> 3L))
  }

  test("steps out of order do not chain") {
    // c before any s: level stops at 1 (the s alone).
    assert(funnel(Seq((1L, 1L, 10L, "c"), (1L, 2L, 20L, "s"))) === Map(1L -> 1L))
  }

  test("no cond1 event means level 0") {
    assert(funnel(Seq((1L, 1L, 10L, "c"), (1L, 2L, 20L, "p"))) === Map(1L -> 0L))
  }

  test("equal timestamps chain by event_id row order, strictly preceding") {
    // s and c share ts=10: c (higher event_id) sees the s -> level 2;
    // reversed ids -> the c precedes the s and cannot chain.
    assert(funnel(Seq((1L, 1L, 10L, "s"), (1L, 2L, 10L, "c"))) === Map(1L -> 2L))
    assert(funnel(Seq((1L, 2L, 10L, "s"), (1L, 1L, 10L, "c"))) === Map(1L -> 1L))
  }

  test("windowFunnel DP equals brute-force chain search on random data") {
    val rnd = new scala.util.Random(42)
    val types = Array("s", "c", "p", "x")
    val rows = (1 to 400).map { i =>
      (rnd.nextInt(12).toLong + 1, i.toLong, rnd.nextInt(300).toLong,
        types(rnd.nextInt(types.length)))
    }
    // brute force: max L such that a strictly-row-ordered chain
    // s->c->p exists with ts_L - ts_1 <= W (rows ordered by ts, id)
    val want = rows.groupBy(_._1).map { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      val chains = Seq("s", "c", "p")
      def best(level: Int, startIdx: Int, startTs: Long): Int =
        if (level == 3) 3
        else {
          val nexts = sorted.zipWithIndex.drop(startIdx).collect {
            case ((_, _, ts, tp), idx)
              if tp == chains(level) && (level == 0 || ts - startTs <= W) =>
                (idx, ts)
          }
          if (nexts.isEmpty) level
          else nexts.map { case (idx, ts) =>
            best(level + 1, idx + 1, if (level == 0) ts else startTs)
          }.max
        }
      uid -> best(0, 0, 0L).toLong
    }
    assert(funnel(rows) === want)
  }

  test("retention flags AND with cond1") {
    val df = Seq(
      (1L, "s"), (1L, "c"),          // signup + click
      (2L, "c"), (2L, "p"),          // no signup: all flags 0
      (3L, "s")                      // signup only
    ).toDF("user_id", "event_type")
    val got = Funnel.retention(df, "user_id",
        Seq(col("event_type") === "s", col("event_type") === "c",
          col("event_type") === "p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(1L -> ((1L, 1L, 0L)), 2L -> ((0L, 0L, 0L)), 3L -> ((1L, 0L, 0L))))
  }

  test("sequenceMatch2 requires strict time order") {
    val df = Seq(
      (1L, 10L, "p"), (1L, 20L, "e"),  // p then e: match
      (2L, 20L, "p"), (2L, 10L, "e"),  // e then p: no match
      (3L, 10L, "p"), (3L, 10L, "e"),  // equal ts: no match (strict)
      (4L, 10L, "p")                   // no e: no match
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.sequenceMatch2(df, "user_id", "ts",
        col("event_type") === "p", col("event_type") === "e")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0))
  }

  private def incFunnel(rows: Seq[(Long, Long, Long, String)]): Map[Long, Long] = {
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    Funnel.windowFunnelStrictIncrease(df, "user_id", "ts",
        Seq(col("event_type") === "s", col("event_type") === "c",
          col("event_type") === "p"),
        windowSpan = W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("strict increase: same-timestamp steps cannot chain") {
    // s and c share ts=10: default mode funnels to 3, increase stops at 1
    val rows = Seq((1L, 1L, 10L, "s"), (1L, 2L, 10L, "c"), (1L, 3L, 20L, "p"))
    assert(incFunnel(rows) === Map(1L -> 1L))
    assert(funnel(rows) === Map(1L -> 3L))
  }

  test("strict increase: strictly increasing chain still funnels fully") {
    assert(incFunnel(Seq(
      (1L, 1L, 10L, "s"), (1L, 2L, 20L, "c"), (1L, 3L, 30L, "p")))
      === Map(1L -> 3L))
  }

  test("strict increase: window still measured from chain start") {
    assert(incFunnel(Seq(
      (1L, 1L, 0L, "s"), (1L, 2L, 60L, "c"), (1L, 3L, 120L, "p")))
      === Map(1L -> 2L))
  }

  private def nextNode(rows: Seq[(Long, Long, Long, String)]): Map[Long, Option[String]] = {
    val df = rows.toDF("user_id", "event_id", "ts", "event_type")
    Funnel.sequenceNextNode(df, "user_id", "ts", "event_id",
        node = col("event_type"), cond = col("event_type") === "s")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
  }

  test("sequenceNextNode: node after the FIRST match only") {
    // first s at ts=20 is followed by c; the later s->p pair is ignored
    assert(nextNode(Seq(
      (1L, 1L, 10L, "x"), (1L, 2L, 20L, "s"), (1L, 3L, 30L, "c"),
      (1L, 4L, 40L, "s"), (1L, 5L, 50L, "p")))
      === Map(1L -> Some("c")))
  }

  test("sequenceNextNode: match at end of stream is NULL; no match is absent") {
    assert(nextNode(Seq(
      (2L, 1L, 10L, "x"), (2L, 2L, 20L, "s"),
      (3L, 1L, 10L, "x")))
      === Map(2L -> None))
  }

  test("sequenceNextNode: equal-time successor resolved by tie-break id") {
    assert(nextNode(Seq(
      (4L, 1L, 10L, "s"), (4L, 2L, 10L, "c"), (4L, 3L, 10L, "p")))
      === Map(4L -> Some("c")))
  }
}
