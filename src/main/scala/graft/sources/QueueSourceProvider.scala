package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.streaming.StreamingWrite
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.readStream.format("graft-queue")` — a full DataSource V2
  * micro-batch connector over [[QueueBroker]]'s network protocol. This
  * is the real-broker proof of the [[graft.streaming.EventPipeline]]
  * queue seam (reference: src/main.ts:540 wires a BullMQ consumer;
  * main.ts:153 `TAKE_UP_TO_PER_BATCH` bounds each drain): the connector
  * implements the same public Spark API surface a Kafka source does —
  * `TableProvider` → `Scan` → `MicroBatchStream` with replayable
  * offsets, `SupportsAdmissionControl` for per-trigger caps, and
  * `SupportsTriggerAvailableNow` for bounded drain-and-stop — and every
  * byte of data crosses a real TCP socket, driver and executor side.
  *
  * Output schema mirrors Kafka's: `value STRING, partition INT,
  * offset LONG`. Decode the body downstream (`from_json` etc.), exactly
  * as the pipeline's Kafka mapping note prescribes.
  *
  * Exactly-once story (asserted in StreamingBrokerSpec): offsets live in
  * the query checkpoint; `planInputPartitions(start, end)` re-fetches a
  * deterministic range on replay (the broker log is retained, as in
  * Kafka); `commit()` is a no-op because the checkpoint — not a
  * broker-side ack — is the source of truth. Options:
  *
  *  - `host`, `port` (required): broker address.
  *  - `maxRecordsPerTrigger` (optional): admission-control cap — the
  *    reference's TAKE_UP_TO_PER_BATCH; surplus WAITS IN THE BROKER
  *    (structural backpressure, no `errors.bulker_full` overflow path).
  */
class QueueSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-queue"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueSourceProvider.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new QueueTable(properties.asScala.toMap)
}

object QueueSourceProvider {
  /** Kafka-shaped record envelope. */
  val SCHEMA: StructType = new StructType()
    .add("value", StringType)
    .add("partition", IntegerType)
    .add("offset", LongType)
}

private[sources] final class QueueTable(rawProps: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  // DSv2 options are case-insensitive by convention (Kafka's are): the
  // properties map arrives case-PRESERVED, so normalize the keys once —
  // a user writing .option("MaxRecordsPerTrigger", …) must get admission
  // control, not a silently unbounded first micro-batch
  private val props: Map[String, String] =
    rawProps.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
  private def opt(key: String): String = props.getOrElse(key,
    throw new IllegalArgumentException(s"graft-queue requires option '$key'"))

  override def name(): String = s"graft-queue(${opt("host")}:${opt("port")})"
  override def schema(): StructType = QueueSourceProvider.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new QueueScan(
        opt("host"), opt("port").toInt,
        props.get("maxrecordspertrigger").map(_.toLong).getOrElse(0L))
    }

  /** The producer half ([[QueueStreamingWrite]]): epoch-idempotent
    * PUBBATCH appends — symmetric with the Kafka surface both ways. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new QueueStreamingWrite(opt("host"), opt("port").toInt, info)
      }
    }
}

private[sources] final class QueueScan(host: String, port: Int,
                                       maxPerTrigger: Long) extends Scan {
  override def readSchema(): StructType = QueueSourceProvider.SCHEMA
  override def description(): String = s"graft-queue $host:$port"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new QueueMicroBatchStream(host, port, maxPerTrigger)
}

/** Per-partition end offsets, serialized to the checkpoint as a JSON
  * array (`[3,5]`) — the connector Offset contract compares by json. */
private[sources] final case class QueueOffset(ends: Seq[Long]) extends Offset {
  override def json(): String = ends.mkString("[", ",", "]")
}

private[sources] object QueueOffset {
  def parse(json: String): QueueOffset = QueueOffset(
    json.trim.stripPrefix("[").stripSuffix("]").split(",")
      .filter(_.nonEmpty).map(_.trim.toLong).toSeq)
}

private[sources] final class QueueMicroBatchStream(
    host: String, port: Int, maxPerTrigger: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def withClient[A](f: QueueBroker.Client => A): A = {
    val c = new QueueBroker.Client(host, port)
    try f(c) finally c.close()
  }

  private lazy val numPartitions: Int = withClient(_.numPartitions)

  // Snapshot taken by prepareForTriggerAvailableNow: AvailableNow drains
  // exactly up to here across however many capped micro-batches it takes,
  // then stops — records published after the snapshot wait for the next run.
  @volatile private var availableNowCap: Option[Seq[Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(withClient(_.endOffsets(numPartitions)))

  override def initialOffset(): Offset = QueueOffset(Seq.fill(numPartitions)(0L))

  override def deserializeOffset(json: String): Offset = QueueOffset.parse(json)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerTrigger > 0) ReadLimit.maxRows(maxPerTrigger)
    else ReadLimit.allAvailable()

  /** Advance each partition toward the broker log end (or the
    * AvailableNow snapshot), spending a ReadMaxRows budget round-robin
    * so a hot partition cannot starve the others — the bounded-drain
    * behavior TAKE_UP_TO_PER_BATCH gives the reference. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[QueueOffset].ends
    val target = availableNowCap.getOrElse(withClient(_.endOffsets(numPartitions)))
    // A restarted stream may see a snapshot taken before older checkpointed
    // offsets were committed; never move backwards.
    val ends = target.zipAll(from, 0L, 0L).map { case (t, f) => math.max(t, f) }
    val effective = limit match {
      case c: CompositeReadLimit =>
        c.getReadLimits.collectFirst { case mr: ReadMaxRows => mr }.getOrElse(limit)
      case other => other
    }
    effective match {
      case mr: ReadMaxRows =>
        var budget = mr.maxRows()
        val next = from.toArray
        var progressed = true
        while (budget > 0 && progressed) {
          progressed = false
          var p = 0
          while (p < next.length && budget > 0) {
            if (next(p) < ends(p)) {
              next(p) += 1; budget -= 1; progressed = true
            }
            p += 1
          }
        }
        QueueOffset(next.toSeq)
      case _ => QueueOffset(ends)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[QueueOffset].ends
    val e = end.asInstanceOf[QueueOffset].ends
    s.indices.collect {
      case p if e(p) > s(p) => QueueInputPartition(host, port, p, s(p), e(p))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new QueueReaderFactory

  /** No broker-side ack: the checkpoint is the source of truth and the
    * log is retained for replay — the Kafka commit model. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

private[sources] final case class QueueInputPartition(
    host: String, port: Int, partition: Int, from: Long, until: Long)
    extends InputPartition

private[sources] final class QueueReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new QueuePartitionReader(partition.asInstanceOf[QueueInputPartition])
}

/** Executor-side reader: one socket connection, one FETCH round-trip for
  * the whole assigned range (ranges are trigger-bounded, so the batch
  * fits the task comfortably; a Kafka reader polls the same way). */
private[sources] final class QueuePartitionReader(p: QueueInputPartition)
    extends PartitionReader[InternalRow] {
  private val client = new QueueBroker.Client(p.host, p.port)
  private val records = client.fetch(p.partition, p.from, p.until).iterator
  private var pos = p.from - 1
  private var current: String = _

  override def next(): Boolean = {
    if (records.hasNext) { current = records.next(); pos += 1; true }
    else false
  }

  override def get(): InternalRow = new GenericInternalRow(
    Array[Any](UTF8String.fromString(current), p.partition, pos))

  override def close(): Unit = client.close()
}
