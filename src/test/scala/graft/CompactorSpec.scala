package graft

import org.apache.spark.sql.functions._
import graft.operators.Compactor

/** Compaction rewrites a fragmented routed table into few files while
  * preserving content, partition dirs, and within-file time order. */
class CompactorSpec extends SparkSpec {
  import spark.implicits._

  test("compact merges fragmented partitions, preserves rows and layout") {
    val dir = tmpDir("compact") + "/events_table"
    val rows = (1 to 500).map(i =>
      (i.toLong, (1000 - i).toLong, if (i % 2 == 0) "click" else "view"))
    // fragment: 20 writer tasks per partition value
    rows.toDF("event_id", "ts", "event_type")
      .repartition(20)
      .write.partitionBy("event_type").parquet(dir)

    val before = spark.read.parquet(dir).collect().toSet
    val stats = Compactor.compact(spark, dir, "event_type", "ts",
      targetBytes = 1024L * 1024 * 1024)
    assert(stats.filesBefore > stats.filesAfter,
      s"no compaction happened: $stats")
    assert(stats.filesAfter <= 2) // one range per partition value here

    val after = spark.read.parquet(dir)
    assert(after.collect().toSet === before)
    // partition pruning still works on the compacted layout
    val clicks = after.filter(col("event_type") === "click")
    assert(clicks.count() == 250)
    assert(clicks.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(event_type"))
  }
}
