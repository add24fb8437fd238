package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

/** SpaceSaving guarantees, pinned: any value with true count >
  * N/capacity is tracked, reported counts upper-bound true counts,
  * and the sketch survives partial-agg merges across partitions. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(values: Seq[String], capacity: Int,
                     partitions: Int): Map[String, Long] = {
    values.toDF("v").repartition(partitions)
      .agg(Fns.heavyHitters(col("v"), capacity).as("hh"))
      .collect()(0).getAs[Map[String, Long]]("hh")
  }

  test("true heavy hitters always survive; counts upper-bound truth") {
    // N = 150: 'hot' 60x, 'warm' 40x, 50 singletons; capacity 8
    // threshold N/capacity = 18.75 -> hot and warm MUST be present
    val rnd = new scala.util.Random(7)
    val values = rnd.shuffle(
      Seq.fill(60)("hot") ++ Seq.fill(40)("warm") ++
        (1 to 50).map(i => s"one$i"))
    for (parts <- Seq(1, 8)) {
      val hh = sketch(values, capacity = 8, partitions = parts)
      assert(hh.size <= 8)
      assert(hh.contains("hot") && hh.contains("warm"), s"lost a heavy hitter: $hh")
      assert(hh("hot") >= 60 && hh("warm") >= 40, s"undercounted: $hh")
      // overestimate is bounded by evicted mass, never above N
      assert(hh("hot") <= 150 && hh("warm") <= 150)
    }
  }

  test("under capacity the sketch is exact") {
    val hh = sketch(Seq("a", "a", "b", "c", "c", "c"), capacity = 8,
      partitions = 4)
    assert(hh === Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }
}
