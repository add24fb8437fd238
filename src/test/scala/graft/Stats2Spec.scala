package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Unit semantics for the r5 final statistical batch: Spearman ρ,
  * median absolute deviation, and one-way ANOVA — hand-computable
  * plants (tools/check.py covers the oracle mirrors). */
class Stats2Spec extends SparkSpec {
  import spark.implicits._

  test("spearman: perfect monotone is +1, perfect inverse is -1") {
    val up = Seq(("g", 1.0, 10L), ("g", 2.0, 20L), ("g", 3.0, 30L),
      ("g", 4.0, 40L)).toDF("g", "x", "y")
    val r1 = Stats.spearman(up, Seq("g"), col("x"), col("y"))
      .collect().head.getAs[Double]("rho")
    assert(math.abs(r1 - 1.0) < 1e-12)
    val down = Seq(("g", 1.0, 40L), ("g", 2.0, 30L), ("g", 3.0, 20L),
      ("g", 4.0, 10L)).toDF("g", "x", "y")
    val r2 = Stats.spearman(down, Seq("g"), col("x"), col("y"))
      .collect().head.getAs[Double]("rho")
    assert(math.abs(r2 + 1.0) < 1e-12)
  }

  test("spearman: tied values use average ranks (matches the closed form)") {
    // x = (1, 2, 2, 3) → avg ranks (1, 2.5, 2.5, 4); y = (10, 20, 30, 40)
    // → ranks (1, 2, 3, 4). Pearson over those rank vectors:
    // ρ = 3√10/10 ≈ 0.9486832980505138
    val df = Seq(("g", 1.0, 10L), ("g", 2.0, 20L), ("g", 2.0, 30L),
      ("g", 3.0, 40L)).toDF("g", "x", "y")
    val r = Stats.spearman(df, Seq("g"), col("x"), col("y"))
      .collect().head.getAs[Double]("rho")
    assert(math.abs(r - 3.0 * math.sqrt(10.0) / 10.0) < 1e-12)
  }

  test("spearman: a constant margin yields null, never NaN") {
    val df = Seq(("g", 5.0, 10L), ("g", 5.0, 20L), ("g", 5.0, 30L))
      .toDF("g", "x", "y")
    val r = Stats.spearman(df, Seq("g"), col("x"), col("y")).collect().head
    assert(r.isNullAt(r.fieldIndex("rho")))
  }

  test("medianAbsDev: odd and even counts use the lower-median convention") {
    // odd: {1, 3, 9} → med 3, |d| = {2, 0, 6} → mad 2
    val odd = Seq(("g", 1L, 1.0), ("g", 2L, 3.0), ("g", 3L, 9.0))
      .toDF("g", "id", "v")
    val r1 = Stats.medianAbsDev(odd, Seq("g"), col("v"), col("id"))
      .collect().head
    assert(r1.getAs[Long]("n") == 3L)
    assert(r1.getAs[Double]("median") == 3.0)
    assert(r1.getAs[Double]("mad") == 2.0)
    // even: {1, 2, 8, 9} → lower med 2 (rank (4-1)*50/100+1 = 2),
    // |d| = {1, 0, 6, 7} → lower med of 4 devs = rank 2 → 1
    val even = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 8.0),
      ("g", 4L, 9.0)).toDF("g", "id", "v")
    val r2 = Stats.medianAbsDev(even, Seq("g"), col("v"), col("id"))
      .collect().head
    assert(r2.getAs[Double]("median") == 2.0)
    assert(r2.getAs[Double]("mad") == 1.0)
  }

  test("anovaF: identical group means give F=0; a known split matches the closed form") {
    val same = Seq(("d", "a", 1.0), ("d", "a", 3.0), ("d", "b", 1.0),
      ("d", "b", 3.0)).toDF("d", "c", "v")
    val f0 = Stats.anovaF(same, Seq("d"), col("c"), col("v"))
      .collect().head.getAs[Double]("f")
    assert(math.abs(f0) < 1e-12)
    // a = {1, 2}, b = {4, 5}: SSB = 9, SSW = 1, F = 9/(1/2) = 18
    val split = Seq(("d", "a", 1.0), ("d", "a", 2.0), ("d", "b", 4.0),
      ("d", "b", 5.0)).toDF("d", "c", "v")
    val r = Stats.anovaF(split, Seq("d"), col("c"), col("v"))
      .collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k") == 2L)
    assert(math.abs(r.getAs[Double]("ssb") - 9.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ssw") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("f") - 18.0) < 1e-9)
  }

  test("spearman, medianAbsDev, anovaF match brute-force references on random tied data") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 6) {
      // small value range forces ties in both margins
      val rows = (0 until 30).map { i =>
        ("g", i.toLong, rnd.nextInt(6).toDouble, rnd.nextInt(8).toLong,
          Seq("a", "b", "c")(rnd.nextInt(3)))
      }
      val df = rows.toDF("g", "id", "x", "y", "cat")

      // --- spearman: average ranks then Pearson, straight from the book
      def avgRanks(vs: Seq[Double]): Seq[Double] = {
        val sorted = vs.sorted
        vs.map { v =>
          val lo = sorted.indexOf(v) + 1
          val hi = sorted.lastIndexOf(v) + 1
          (lo + hi) / 2.0
        }
      }
      val rx = avgRanks(rows.map(_._3))
      val ry = avgRanks(rows.map(_._4.toDouble))
      val n = rows.length.toDouble
      val (mx, my) = (rx.sum / n, ry.sum / n)
      val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = rx.map(a => (a - mx) * (a - mx)).sum
      val vy = ry.map(b => (b - my) * (b - my)).sum
      val refRho = cov / math.sqrt(vx * vy)
      val gotRho = Stats.spearman(df, Seq("g"), col("x"), col("y"))
        .collect().head.getAs[Double]("rho")
      assert(math.abs(gotRho - refRho) < 1e-9, s"trial $trial spearman")

      // --- medianAbsDev: lower median under (value, id) order
      def lowerMedian(vs: Seq[(Double, Long)]): Double = {
        val s = vs.sortBy(identity)
        s((s.length - 1) / 2)._1
      }
      val med = lowerMedian(rows.map(r => (r._3, r._2)))
      val refMad = lowerMedian(rows.map(r => (math.abs(r._3 - med), r._2)))
      val gotMad = Stats.medianAbsDev(df, Seq("g"), col("x"), col("id"))
        .collect().head
      assert(gotMad.getAs[Double]("median") == med, s"trial $trial median")
      assert(gotMad.getAs[Double]("mad") == refMad, s"trial $trial mad")

      // --- anovaF: direct between/within decomposition over cat groups
      val groups = rows.groupBy(_._5).values.map(_.map(_._3)).toSeq
      val grand = rows.map(_._3).sum / n
      val ssb = groups.map(g =>
        g.length * math.pow(g.sum / g.length - grand, 2)).sum
      val ssw = groups.map(g =>
        g.map(v => math.pow(v - g.sum / g.length, 2)).sum).sum
      val k = groups.length.toDouble
      val refF = (ssb / (k - 1)) / (ssw / (n - k))
      val gotF = Stats.anovaF(df, Seq("g"), col("cat"), col("x"))
        .collect().head.getAs[Double]("f")
      assert(math.abs(gotF - refF) < 1e-6, s"trial $trial anova")
    }
  }

  test("anovaF: single category or zero within-variance yields null F") {
    val one = Seq(("d", "a", 1.0), ("d", "a", 2.0)).toDF("d", "c", "v")
    val r1 = Stats.anovaF(one, Seq("d"), col("c"), col("v")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("f")))
    val flat = Seq(("d", "a", 1.0), ("d", "a", 1.0), ("d", "b", 2.0),
      ("d", "b", 2.0)).toDF("d", "c", "v")
    val r2 = Stats.anovaF(flat, Seq("d"), col("c"), col("v")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("f")))
  }
}
