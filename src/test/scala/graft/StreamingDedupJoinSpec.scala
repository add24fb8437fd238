package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Event, StreamingAnalytics}

/** Round-2 streaming twins: watermark-bounded exact dedup and the
  * stream-stream interval join, both driven through real streams. */
class StreamingDedupJoinSpec extends SparkSpec {
  import spark.implicits._

  private val ns = 1000000000L
  private def ev(id: Long, tsSec: Long, uid: Long, tpe: String, v: Double) =
    Event(id, tsSec * ns, uid, tpe, v)

  test("dedupStream drops in-watermark duplicates") {
    val base = 1700000000L
    val rows = Seq(
      ev(1, base + 10, 1, "click", 1.0),
      ev(1, base + 20, 1, "click", 1.0),   // duplicate id within watermark
      ev(2, base + 30, 2, "view", 2.0),
      ev(2, base + 31, 2, "view", 2.0),    // duplicate
      ev(3, base + 40, 3, "click", 3.0))
    val dir = tmpDir("sdedup")
    rows.toDF().write.parquet(s"$dir/in")

    val stream = spark.readStream.schema(rows.toDF().schema).parquet(s"$dir/in")
    val q = StreamingAnalytics.dedupStream(stream, Seq("event_id"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("sdedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val ids = spark.table("sdedup").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("interval join matches the batch range-join semantics on a stream") {
    val base = 1700000000L
    val purchases = Seq(
      ev(10, base + 0, 1, "purchase", 0.0),
      ev(11, base + 5000, 2, "purchase", 0.0))
    val errors = Seq(
      ev(20, base + 60, 1, "error", 0.0),     // within 30 min of p10
      ev(21, base + 2000, 1, "error", 0.0),   // outside 30 min (1800s)
      ev(22, base + 5100, 2, "error", 0.0),   // within, other user
      ev(23, base - 50, 1, "error", 0.0))     // before the purchase
    val dir = tmpDir("sjoin")
    purchases.toDF().write.parquet(s"$dir/l")
    errors.toDF().write.parquet(s"$dir/r")

    val ls = spark.readStream.schema(purchases.toDF().schema).parquet(s"$dir/l")
    val rs = spark.readStream.schema(errors.toDF().schema).parquet(s"$dir/r")
    val q = StreamingAnalytics.intervalJoinStream(ls, rs, "user_id",
        maxDeltaNs = 1800L * ns)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("sjoin")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sjoin")
      .select("l_id", "r_id", "delta_s").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(got === Seq((10L, 20L, 60L), (11L, 22L, 100L)))
  }
}
