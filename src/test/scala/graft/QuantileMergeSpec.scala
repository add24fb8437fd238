package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

/** b37's correctness story (rows-only at the driver): Greenwald-Khanna
  * quantile states merged across parts must land within the ε rank
  * guarantee of the exact order statistic — |rank(q̂) − p·n| ≤ ε·n
  * (merge inflates ε additively; we assert a conservative 3ε), and an
  * empty merge must surface NULL, not a phantom estimate. */
class QuantileMergeSpec extends SparkSpec {
  import spark.implicits._

  test("merged per-part GK states estimate within rank guarantee of exact") {
    // 2 groups with different shapes: uniform and heavy-tailed (squares),
    // split into 3 parts by id so each state sees an arbitrary slice
    val n = 6000
    val rows = (0 until n).map { i =>
      if (i % 2 == 0) (i.toLong, "uniform", (i % 1000).toDouble)
      else (i.toLong, "squares", ((i % 100).toDouble / 10) * ((i % 100) / 10))
    }
    val df = rows.toDF("id", "grp", "v")
    val accuracy = 1000 // ε = 1e-3

    val parts = (0 to 2).map(p =>
      df.filter(pmod(col("id"), lit(3)) === p)
        .groupBy(col("grp"))
        .agg(Fns.quantileState(col("v"), accuracy).as("st")))
    val pcts = Seq(0.1, 0.5, 0.9, 0.99)
    val merged = parts.reduce(_.unionByName(_))
      .groupBy(col("grp"))
      .agg(Fns.quantileMerge(col("st"), pcts, accuracy).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

    val exact = df.collect().groupBy(_.getString(1)).map { case (g, rs) =>
      g -> rs.map(_.getDouble(2)).sorted
    }

    merged.foreach { case (g, ests) =>
      val sortedVals = exact(g)
      val groupN = sortedVals.length
      pcts.zip(ests).foreach { case (p, est) =>
        // GK guarantees SOME rank of the returned element is within ε·n
        // of p·n; with ties that's anywhere in [count(<est)+1, count(≤est)]
        val lo = sortedVals.count(_ < est) + 1
        val hi = sortedVals.count(_ <= est)
        val target = p * groupN
        val err =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0.0
        assert(err <= 3 * (groupN.toDouble / accuracy) + 1,
          s"$g p$p: estimate $est has ranks [$lo,$hi], want ~$target")
      }
    }
  }

  test("b37 on sf0.001: 3 rows per type, exact quantiles ordered, bands hold") {
    val out = SparkEntry.queries("b37_quantile_merge")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.length % 3 == 0)
    out.foreach { r =>
      assert(r.getLong(3) == 1L,
        s"merged estimate outside the ε rank band: $r")
    }
    out.grouped(3).foreach { g =>
      val Seq(p50, p90, p99) = g.map(_.getDouble(2)).toSeq
      assert(p50 <= p90 && p90 <= p99, s"unordered exact quantiles: ${g.toSeq}")
    }
  }

  test("merging only empty states yields NULL, and null inputs are skipped") {
    val df = Seq(("a", None: Option[Double]), ("a", None))
      .toDF("grp", "v")
    val st = df.groupBy(col("grp"))
      .agg(Fns.quantileState(col("v"), 100).as("st"))
    val out = st.groupBy(col("grp"))
      .agg(Fns.quantileMerge(col("st"), Seq(0.5), 100).as("qs"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(1))
  }
}
