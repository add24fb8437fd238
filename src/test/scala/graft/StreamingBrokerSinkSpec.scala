package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.QueueBroker

/** The WRITE half of the broker connector
  * ([[graft.sources.QueueStreamWriter]]): `writeStream.format
  * ("graft-queue")` publishing through epoch-idempotent PUBBATCH
  * appends — the sibling StreamingBrokerSpec's ask, write-side
  * (reference: main.ts:388-409, the producer half of the retry loop).
  * Forces BOTH retry shapes the protocol must absorb — a task-level
  * duplicate commit and a whole-epoch replay — and asserts the log
  * gained nothing. */
class StreamingBrokerSinkSpec extends SparkSpec {
  import spark.implicits._

  private def drain(b: QueueBroker): Seq[String] =
    (0 until b.numPartitions).flatMap { p =>
      val c = new QueueBroker.Client(b.host, b.port)
      try c.fetch(p, 0, c.endOffset(p)) finally c.close()
    }

  test("writeStream publishes each row exactly once; roundtrip reads back") {
    val broker = new QueueBroker(numPartitions = 2)
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[String]
      in.addData((1 to 20).map(i => s"m$i"): _*)
      val ck = tmpDir("graft_sink_ck")
      val q = in.toDF().select(col("value"))
        .writeStream.format("graft-queue")
        .option("host", broker.host)
        .option("port", broker.port.toString)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(drain(broker).sorted == (1 to 20).map(i => s"m$i").sorted)

      // second micro-batch appends (new epoch, not a dup)
      in.addData("extra1", "extra2")
      val q2 = in.toDF().select(col("value"))
        .writeStream.format("graft-queue")
        .option("host", broker.host)
        .option("port", broker.port.toString)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      assert(drain(broker).size == 22)

      // read the log back through the source half — the connector is
      // symmetric: what the sink produced is exactly what a consumer sees
      val rows = spark.readStream.format("graft-queue")
        .option("host", broker.host)
        .option("port", broker.port.toString)
        .load()
      val outCk = tmpDir("graft_sink_rt")
      val got = scala.collection.mutable.ArrayBuffer[String]()
      val rt = rows.writeStream
        .option("checkpointLocation", s"$outCk/ck")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.select("value").collect().map(_.getString(0)); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      rt.awaitTermination()
      assert(got.sorted == drain(broker).sorted)
    } finally broker.close()
  }

  test("explicit partition column routes rows; hash routing is deterministic") {
    val broker = new QueueBroker(numPartitions = 3)
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Int)]
      in.addData((1 to 9).map(i => (s"r$i", i % 3)): _*)
      val q = in.toDF().toDF("value", "partition")
        .writeStream.format("graft-queue")
        .option("host", broker.host)
        .option("port", broker.port.toString)
        .option("checkpointLocation", tmpDir("graft_sink_part"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val c = new QueueBroker.Client(broker.host, broker.port)
      try (0 until 3).foreach { p =>
        val got = c.fetch(p, 0, c.endOffset(p))
        assert(got.size == 3, s"partition $p: $got")
        assert(got.forall(v => v.drop(1).toInt % 3 == p))
      } finally c.close()
    } finally broker.close()
  }

  test("task retry and epoch replay are deduped — the log gains nothing") {
    val broker = new QueueBroker(numPartitions = 2)
    try {
      val rows = Seq((0, "a"), (1, "b"), (0, "c"))
      val c = new QueueBroker.Client(broker.host, broker.port)
      try {
        // first offer of (query q1, epoch 7, writer 0): accepted
        assert(c.publishBatch("q1", 7L, 0, rows) == 3L)
        // task retry (same triple): rejected wholesale
        assert(c.publishBatch("q1", 7L, 0, rows) == 0L)
        // epoch replay after restart re-offers every writer's batch
        val c2 = new QueueBroker.Client(broker.host, broker.port)
        try assert(c2.publishBatch("q1", 7L, 0, rows) == 0L)
        finally c2.close()
        // a different writer, epoch, or query is NOT a dup
        assert(c.publishBatch("q1", 7L, 1, rows.take(1)) == 1L)
        assert(c.publishBatch("q1", 8L, 0, rows.take(1)) == 1L)
        assert(c.publishBatch("q2", 7L, 0, rows.take(1)) == 1L)
        assert(c.endOffset(0) + c.endOffset(1) == 6L)
      } finally c.close()
    } finally broker.close()
  }

  test("key replay with DIFFERENT content is refused loudly, not silently dropped") {
    // the r8 advisor's scenario: a restart changes the sink's partition
    // layout, so a replayed (query, epoch, writer) key carries other
    // rows — accepting would lose/duplicate; the broker must refuse
    val broker = new QueueBroker(numPartitions = 2)
    try {
      val c = new QueueBroker.Client(broker.host, broker.port)
      try {
        assert(c.publishBatch("q1", 3L, 0, Seq((0, "a"), (1, "b"))) == 2L)
        val e = intercept[java.io.IOException] {
          c.publishBatch("q1", 3L, 0, Seq((0, "a"), (1, "DIFFERENT")))
        }
        assert(e.getMessage.contains("digest mismatch"))
        // byte-identical replay still dedups cleanly afterwards
        val c2 = new QueueBroker.Client(broker.host, broker.port)
        try assert(c2.publishBatch("q1", 3L, 0, Seq((0, "a"), (1, "b"))) == 0L)
        finally c2.close()
      } finally c.close()
    } finally broker.close()
  }

  test("dedup ledger is bounded: old epochs evict, recent ones stay deduped") {
    val broker = new QueueBroker(numPartitions = 1)
    try {
      val c = new QueueBroker.Client(broker.host, broker.port)
      try {
        // a long-running stream: 200 epochs x 2 writers
        (0L until 200L).foreach { e =>
          assert(c.publishBatch("q1", e, 0, Seq((0, s"e$e-w0"))) == 1L)
          assert(c.publishBatch("q1", e, 1, Seq((0, s"e$e-w1"))) == 1L)
        }
        // without eviction this would be 400 entries; the watermark
        // keeps only the retained-epoch window per query
        assert(broker.ledgerSize <= 2 * 9,
          s"ledger leaked: ${broker.ledgerSize} entries after 200 epochs")
        // epochs inside the retained window still dedup (the only
        // epochs Spark can legally replay after a restart)
        assert(c.publishBatch("q1", 199L, 0, Seq((0, "e199-w0"))) == 0L)
        assert(c.publishBatch("q1", 195L, 1, Seq((0, "e195-w1"))) == 0L)
      } finally c.close()
    } finally broker.close()
  }

  test("a replayed batch with the same rows in a DIFFERENT order still dedups") {
    // Spark only guarantees a retried/speculative task re-produces the
    // same row SET, not the same arrival order (shuffle fetch order
    // varies across attempts) — an order-sensitive digest would refuse
    // the legal replay and fail the query permanently
    val broker = new QueueBroker(numPartitions = 2)
    try {
      val c = new QueueBroker.Client(broker.host, broker.port)
      try {
        assert(c.publishBatch("q1", 5L, 0,
          Seq((0, "a"), (1, "b"), (0, "c"))) == 3L)
        assert(c.publishBatch("q1", 5L, 0,
          Seq((0, "c"), (0, "a"), (1, "b"))) == 0L)
        // same multiset of payloads on DIFFERENT partitions is a real
        // content change and must still refuse loudly
        val e = intercept[java.io.IOException] {
          c.publishBatch("q1", 5L, 0, Seq((1, "a"), (0, "b"), (0, "c")))
        }
        assert(e.getMessage.contains("digest mismatch"))
      } finally c.close()
    } finally broker.close()
  }

  test("a batch with an out-of-range partition is refused WHOLESALE — nothing appends") {
    val broker = new QueueBroker(numPartitions = 2)
    try {
      val c = new QueueBroker.Client(broker.host, broker.port)
      try {
        val e = intercept[java.io.IOException] {
          c.publishBatch("q1", 0L, 0, Seq((0, "a"), (5, "b")))
        }
        assert(e.getMessage.contains("out of range"))
        assert(broker.endOffsets.sum == 0L,
          "a refused batch must not leave a partial append behind")
        // the connection survives and a corrected retry lands atomically
        assert(c.publishBatch("q1", 0L, 0, Seq((0, "a"), (1, "b"))) == 2L)
        assert(broker.endOffsets.sum == 2L)
      } finally c.close()
    } finally broker.close()
  }

  test("dedup ledger is bounded across publish call ids, and ONLY across those") {
    // QueuePublisher mints a fresh "pub-" call id per publish(); the
    // epoch watermark alone never evicts those (each lives at epoch 0
    // of its own query), so the broker LRU-bounds that namespace —
    // and ONLY that namespace: a streaming sink id must survive
    // arbitrary publish churn untouched, because its query may crash
    // after the broker accepted an epoch but before the checkpoint
    // committed, and legally re-offer that epoch much later
    val broker = new QueueBroker(numPartitions = 1)
    try {
      val c = new QueueBroker.Client(broker.host, broker.port)
      try {
        // a streaming epoch accepted BEFORE the churn, then never
        // touched while 900 publish calls come and go
        assert(c.publishBatch("stream-q", 7L, 0, Seq((0, "s7"))) == 1L)
        (0 until 900).foreach { i =>
          assert(c.publishBatch(s"pub-$i", 0L, 0, Seq((0, s"job$i"))) == 1L)
        }
        assert(broker.ledgerSize <= 256 + 1,
          s"ledger leaked across call ids: ${broker.ledgerSize} after 900 calls")
        // recent call ids still dedup their task retries…
        assert(c.publishBatch("pub-899", 0L, 0, Seq((0, "job899"))) == 0L)
        // …and the crash-replayed streaming epoch is STILL deduped —
        // eviction must never have touched the non-pub namespace
        assert(c.publishBatch("stream-q", 7L, 0, Seq((0, "s7"))) == 0L,
          "publish churn evicted a streaming query's epoch entry: a " +
            "restart replay would silently double-append")
      } finally c.close()
    } finally broker.close()
  }
}
