package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Executor-parallel publish of a DataFrame back to the [[QueueBroker]]
  * — the reference's RE-ENQUEUE half (main.ts:388-409: a failed batch
  * fans out as single-row retry jobs pushed back onto the queue). Each
  * task opens its own socket connection (the per-task producer shape a
  * Kafka sink uses — nothing corpus-sized crosses the driver), and
  * rows route to broker partition pmod(hash(key), P) so retries for
  * the same message land on a deterministic partition. Returns the
  * number published (accumulator-counted on the executors).
  *
  * Delivery is at-least-once, same as any socket producer without a
  * transactional broker: a task retry may re-publish its rows. The
  * consumer side's `message_id` dedup (the pipeline's standing
  * contract) is what restores exactly-once end to end.
  */
object QueuePublisher {

  def publish(df: DataFrame, host: String, port: Int,
              payload: Column, key: Column): Long = {
    val acc = df.sparkSession.sparkContext.longAccumulator("queue_published")
    val parts = {
      val c = new QueueBroker.Client(host, port)
      try c.numPartitions finally c.close()
    }
    df.select(payload.cast("string").as("__p"),
        pmod(hash(key), lit(parts)).as("__bp"))
      .filter(col("__p").isNotNull)
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val c = new QueueBroker.Client(host, port)
          try it.foreach { r =>
            c.publish(r.getInt(1), r.getString(0)); acc.add(1L)
          } finally c.close()
        }
      }
    acc.value
  }
}
