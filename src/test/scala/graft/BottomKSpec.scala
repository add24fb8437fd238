package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bottom_k_by_hash returns the k min-hash values, hash-ordered, deterministically") {
    val ids = (1L to 100L)
    val df = ids.map(i => (if (i % 2 == 0) "a" else "b", i)).toDF("g", "id")
      .repartition(8) // force partial aggregation + merges
    val out = Fns.bottomKByHash(col("id"), 3)
    val got = df.groupBy("g").agg(out.as("sample"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Long]]("sample").toSeq).toMap
    def expected(pred: Long => Boolean): Seq[Long] =
      ids.filter(pred).map(i => (md5hex(i.toString), i)).sorted.take(3).map(_._2)
    assert(got("a") == expected(_ % 2 == 0))
    assert(got("b") == expected(_ % 2 == 1))
    // deterministic across runs / partitionings
    val again = df.repartition(3).groupBy("g").agg(out.as("sample"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Long]]("sample").toSeq).toMap
    assert(again == got)
  }

  test("groups smaller than k return all their values") {
    val df = Seq(("x", 1L), ("x", 2L)).toDF("g", "id")
    val got = df.groupBy("g").agg(Fns.bottomKByHash(col("id"), 5).as("s"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("s")
    assert(got.toSet == Set(1L, 2L))
  }

  test("nulls don't contribute") {
    val df = Seq(("x", Some(1L)), ("x", None), ("x", Some(2L)))
      .toDF("g", "id")
    val got = df.groupBy("g").agg(Fns.bottomKByHash(col("id"), 5).as("s"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("s")
    assert(got.toSet == Set(1L, 2L))
  }
}
