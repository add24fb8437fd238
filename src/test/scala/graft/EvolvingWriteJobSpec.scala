package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.SparkListener
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.apache.spark.sql.functions._
import graft.streaming.EventPipeline

/** The streaming router's write must be ONE routed job per micro-batch
  * (the batch router's one-shuffle shape), not a per-present-type job
  * loop — at high type cardinality the loop serialized N sequential
  * filtered writes per trigger. Counted via SQL-execution events whose
  * physical plan is a parquet insert. */
class EvolvingWriteJobSpec extends SparkSpec {
  import spark.implicits._

  private def countInserts[A](body: => A): Int = {
    val n = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: SparkListenerSQLExecutionStart
            if e.physicalPlanDescription.contains("InsertIntoHadoopFsRelation") =>
            n.incrementAndGet(); ()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // the listener bus is async; wait for it to drain
      val deadline = System.nanoTime() + 10e9.toLong
      var last = -1
      while (System.nanoTime() < deadline && n.get() != last) {
        last = n.get(); Thread.sleep(300)
      }
      n.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("evolving router: one insert job per micro-batch across many types") {
    val base = tmpDir("evojobs")
    val cfg = EventPipeline.Config(s"$base/in", s"$base/out", s"$base/ck")
    val rows = (0 until 40).map { i =>
      (i.toLong, 1700000000000000000L + i * 1000000000L, i.toLong % 7,
        s"type_${i % 8}", i * 1.5, s"""{"k":$i}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(cfg.inputDir)

    val inserts = countInserts {
      EventPipeline.startEvolving(spark, spark.read.parquet(cfg.inputDir).schema, cfg)
        .awaitTermination()
    }
    // 8 event types, ONE routed staging write (the input-setup write
    // happened before the listener registered)
    assert(inserts == 1, s"expected exactly 1 insert job for 8 types, saw $inserts")

    // every type's table materialized from the single write
    (0 until 8).foreach { t =>
      val tbl = EventPipeline.readEvolvingTable(spark, cfg, s"type_$t")
      assert(tbl.count() == 5, s"type_$t lost rows in the shared write")
      assert(tbl.columns.contains("message_id") && tbl.columns.contains("k"))
    }
  }

  test("cast-needing types fall back alone; cast-free types still share one write") {
    val base = tmpDir("evojobs2")
    val cfg = EventPipeline.Config(s"$base/in", s"$base/out", s"$base/ck")
    def write(rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(cfg.inputDir)
    val schema = {
      write(Seq((0L, 1700000000000000000L, 0L, "a", 1.0, """{"amount": 1.5}""")))
      spark.read.parquet(cfg.inputDir).schema
    }
    EventPipeline.startEvolving(spark, schema, cfg).awaitTermination()

    // batch 2: type a's amount widens to string (rewrite path), b/c are new
    write(Seq(
      (1L, 1700000001000000000L, 1L, "a", 2.0, """{"amount": "usd_9"}"""),
      (2L, 1700000002000000000L, 2L, "b", 3.0, """{"amount": "x"}"""),
      (3L, 1700000003000000000L, 3L, "c", 4.0, """{"amount": "y"}""")))
    val inserts = countInserts {
      EventPipeline.startEvolving(spark, schema, cfg).awaitTermination()
    }
    // one shared staging write (b, c) + one widen rewrite (a)
    assert(inserts == 2, s"expected shared write + one widen rewrite, saw $inserts")
    val a = EventPipeline.readEvolvingTable(spark, cfg, "a").orderBy("event_id").collect()
    assert(a.map(_.getAs[String]("amount")).toSeq == Seq("1.5", "usd_9"))
    assert(EventPipeline.readEvolvingTable(spark, cfg, "b").count() == 1)
  }
}
