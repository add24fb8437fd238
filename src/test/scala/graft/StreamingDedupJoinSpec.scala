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

  test("interval join state is watermark-pruned across micro-batches") {
    // The r10 join re-applied the exact ns bound as raw-long arithmetic
    // AFTER the join — a shape StreamingJoinHelper can't turn into a
    // state watermark (it WARNed "Error trying to extract state
    // constraint" and buffered state forever). With the bound purely on
    // the watermarked (scaled-clock) timestamps, Spark prunes both
    // sides' buffers as the watermark passes them: a bulky first batch
    // must be GONE from the state store by the last batch.
    val base = 1700000000L
    val dir = tmpDir("sjoin_prune")
    def writeBatch(side: String, i: Int, rows: Seq[Event]): Unit = {
      val tmp = s"$dir/stage_${side}_$i"
      rows.toDF().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/$side/batch_$i.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // deterministic per-batch file order for maxFilesPerTrigger=1
      dst.setLastModified((1700000000L + i * 60L) * 1000L)
    }
    // batch 0 is bulky (5 pairs at t0, one user each so pairs stay
    // 1:1); later batches 1 pair each, 1000 s apart — far past
    // watermark(10 s) + maxDelta(30 s)
    writeBatch("l", 0, (0 until 5).map(j => ev(10 + j, base + j, 50 + j, "purchase", 0.0)))
    writeBatch("r", 0, (0 until 5).map(j => ev(20 + j, base + j + 2, 50 + j, "error", 0.0)))
    for (i <- 1 to 3) {
      writeBatch("l", i, Seq(ev(100 + i, base + i * 1000, 1, "purchase", 0.0)))
      writeBatch("r", i, Seq(ev(200 + i, base + i * 1000 + 2, 1, "error", 0.0)))
    }
    val schema = Seq(ev(0, 0, 0, "x", 0.0)).toDF().schema
    def src(side: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/$side")
    val q = StreamingAnalytics.intervalJoinStream(src("l"), src("r"),
        "user_id", maxDeltaNs = 30L * ns, watermarkNs = 10L * ns)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ck")
      .format("memory").queryName("sjoin_prune")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // every in-window pair found, across all batches
    assert(spark.table("sjoin_prune").count() === 8L)
    val stateRows = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.head.numRowsTotal)
    assert(stateRows.nonEmpty)
    assert(stateRows.max >= 10L,
      s"bulk batch should enter the state store (saw $stateRows)")
    assert(stateRows.last < stateRows.max,
      s"state must shrink once the watermark passes the bulk batch (saw $stateRows)")
  }
}
