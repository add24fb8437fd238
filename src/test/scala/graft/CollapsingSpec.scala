package graft

import org.apache.spark.sql.functions._
import graft.operators.Collapsing

/** CollapsingMergeTree collapse semantics on hand-built signed write
  * streams: (key, ver, payload, sign). */
class CollapsingSpec extends SparkSpec {
  import spark.implicits._

  private def collapse(rows: Seq[(Long, Int, String, Int)]): Map[Long, (Int, String)] = {
    val df = rows.toDF("k", "ver", "payload", "sign")
    Collapsing.collapse(df, Seq("k"), Seq(col("ver")), col("sign"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
  }

  test("matched cancels collapse away; the latest +1 survives") {
    // k=1: v1 written, cancelled, v2 written -> v2 survives
    assert(collapse(Seq(
      (1L, 1, "a", 1), (1L, 1, "a", -1), (1L, 2, "b", 1)))
      === Map(1L -> ((2, "b"))))
  }

  test("a trailing uncancelled -1 deletes the key") {
    // k=1 lives; k=2's final state is cancelled with nothing after
    assert(collapse(Seq(
      (1L, 1, "a", 1),
      (2L, 1, "x", 1), (2L, 1, "x", -1)))
      === Map(1L -> ((1, "a"))))
  }

  test("cancel-only garbage (net < 0) never surfaces") {
    assert(collapse(Seq((3L, 1, "ghost", -1))) === Map.empty)
  }

  test("collapse is insensitive to part arrival order") {
    val writes = Seq(
      (1L, 1, "a", 1), (1L, 2, "b", 1), (1L, 1, "a", -1),
      (2L, 1, "x", 1), (2L, 2, "y", 1), (2L, 1, "x", -1), (2L, 2, "y", -1))
    val expected = Map(1L -> ((2, "b")))
    // same multiset, three arrival orders
    assert(collapse(writes) === expected)
    assert(collapse(writes.reverse) === expected)
    assert(collapse(scala.util.Random.shuffle(writes)) === expected)
  }

  test("net > 0 with interleaved cancels picks the max-version +1 row") {
    // +1 at v3 arrives before the v2 cancel; survivor is still v3
    assert(collapse(Seq(
      (1L, 1, "a", 1), (1L, 3, "c", 1), (1L, 2, "b", 1),
      (1L, 2, "b", -1), (1L, 1, "a", -1)))
      === Map(1L -> ((3, "c"))))
  }

  private def collapseV(rows: Seq[(Long, Int, String, Int)]): Map[Long, (Int, String)] = {
    val df = rows.toDF("k", "ver", "payload", "sign")
    Collapsing.collapseVersioned(df, Seq("k"), col("ver"), col("sign"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
  }

  test("versioned: a dangling cancel does not delete the live state") {
    // the out-of-order case VersionedCollapsing exists for: a cancel
    // whose +1 never arrived. Plain collapse nets the key to zero and
    // wrongly deletes it; versioned annihilates only version-matched
    // pairs, so v1 survives.
    val rows = Seq((1L, 1, "a", 1), (1L, 2, "b", -1))
    assert(collapseV(rows) === Map(1L -> ((1, "a"))))
    assert(collapse(rows) === Map.empty)
  }

  test("versioned: cancel annihilates exactly its version, any arrival order") {
    // v2's cancel arrives BEFORE its +1; both orders collapse to v1
    val rows = Seq((1L, 2, "b", -1), (1L, 1, "a", 1), (1L, 2, "b", 1))
    assert(collapseV(rows) === Map(1L -> ((1, "a"))))
    assert(collapseV(rows.reverse) === Map(1L -> ((1, "a"))))
  }

  test("versioned: deleting the latest version resurfaces the earlier one") {
    assert(collapseV(Seq(
      (1L, 1, "a", 1), (1L, 2, "b", 1), (1L, 2, "b", -1)))
      === Map(1L -> ((1, "a"))))
    // every version cancelled -> key disappears
    assert(collapseV(Seq((2L, 1, "x", 1), (2L, 1, "x", -1))) === Map.empty)
  }
}
