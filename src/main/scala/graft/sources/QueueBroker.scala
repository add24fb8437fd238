package graft.sources

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.Base64
import scala.collection.mutable.ArrayBuffer

/** Minimal partitioned append-only-log broker served over real localhost
  * TCP sockets — the in-process stand-in for the reference's Redis/BullMQ
  * broker (reference: src/main.ts:540 `queue.process`; the container is
  * zero-egress and ships no broker jars, so the broker itself is ~100
  * lines here, but everything the Spark side touches is a genuine
  * network API, not a shared-memory shortcut).
  *
  * Semantics are deliberately the Kafka/Redis-streams core that matters
  * for exactly-once:
  *  - N partitions, each an append-only log addressed by offset;
  *  - `PUB` appends and returns the assigned offset;
  *  - `END` returns a partition's log-end offset;
  *  - `FETCH from until` re-reads any retained range deterministically —
  *    which is precisely the property the checkpoint-replay story in
  *    [[QueueSourceProvider]] depends on. Retention here is whole-log
  *    (a test double keeps everything); a production broker prunes
  *    below the consumers' committed offsets, which the connector
  *    already tracks in its checkpoint, so nothing Spark-side assumes
  *    offsets older than the last checkpoint stay readable.
  *
  * Protocol (line-oriented, payloads base64 so records may hold any
  * UTF-8 including newlines):
  * {{{
  *   PARTS                     -> OK <numPartitions>
  *   END <p>                   -> OK <endOffset>
  *   PUB <p> <b64>             -> OK <assignedOffset>
  *   FETCH <p> <from> <until>  -> OK <n> then n lines of <b64>
  *   PUBBATCH <qid> <e> <w> <n>, n lines of "<p> <b64>"
  *                             -> OK <appended>  (0 on retry — the
  *                                Kafka idempotent-producer dedup)
  * }}}
  */
final class QueueBroker(val numPartitions: Int = 2) extends AutoCloseable {
  private val logs = Array.fill(numPartitions)(new ArrayBuffer[String]())
  // idempotent-producer ledger: one entry per accepted (query, epoch,
  // writer) batch — the Kafka producer-id/sequence dedup model, which
  // is what makes sink-side epoch retries exactly-once (PUBBATCH).
  // Bounded: epochs commit in order per query, so once epoch E is seen,
  // a replay can only target E-1/E (task retry within the epoch, or the
  // epoch re-run after a restart from the last checkpoint). Entries
  // below maxEpoch - retainedEpochs can never legally replay and are
  // evicted — without this a long-running stream leaks one entry per
  // (epoch × writer) forever.
  // The ledger also keeps a content digest per accepted batch: a replay
  // must carry the SAME ROW MULTISET on the same partitions (arrival
  // order is free — Spark doesn't guarantee it across task attempts).
  // If a restart changed the sink's partition layout, replayed rows
  // arrive under different writer ids with different content — digest
  // mismatch fails the write LOUDLY instead of silently
  // dropping/duplicating.
  // Streaming sinks reuse ONE queryId across epochs (bounded by the
  // epoch watermark above), but batch publishers ([[QueuePublisher]])
  // mint a fresh call id per publish — without a bound across those
  // ids a long-lived broker leaks one entry per call. ONLY that
  // namespace is evictable: ids with the publisher's "pub-" prefix
  // are LRU-bounded (a batch publish's task retry can only arrive
  // while its Spark job is still running, so a pub id idle behind 256
  // newer ones can never legally replay — Kafka's producer-id-expiry
  // reasoning). Streaming sink ids are NEVER evicted: a streaming
  // query may crash after the broker accepted an epoch but before the
  // Spark checkpoint committed, and legally re-offer that epoch after
  // an arbitrarily long outage — evicting its entries under publish
  // churn would turn that replay into a silent double-append. Their
  // footprint stays bounded by the per-query epoch watermark.
  private val retainedEpochs = 8L
  private val retainedQueries = 256
  private val evictablePrefix = "pub-"
  private var touchCounter = 0L
  private val queryTouch = scala.collection.mutable.Map[String, Long]()
  private val seenBatches =
    scala.collection.mutable.Map[String,
      scala.collection.mutable.Map[Long, scala.collection.mutable.Map[Int, Long]]]()

  private def touch(query: String): Unit =
    if (query.startsWith(evictablePrefix)) {
      touchCounter += 1
      queryTouch(query) = touchCounter
    }

  /** Ledger entry count across all queries/epochs — test hook for the
    * boundedness guarantee. */
  private[graft] def ledgerSize: Int = logs.synchronized {
    seenBatches.valuesIterator.map(_.valuesIterator.map(_.size).sum).sum
  }

  /** None = unseen; Some(digest) = previously accepted with that digest. */
  private def batchSeen(query: String, epoch: Long, writer: Int): Option[Long] = {
    val hit = seenBatches.get(query).flatMap(_.get(epoch)).flatMap(_.get(writer))
    if (seenBatches.contains(query)) touch(query) // keep active queries hot
    hit
  }

  private def recordBatch(query: String, epoch: Long, writer: Int,
                          digest: Long): Unit = {
    val epochs = seenBatches.getOrElseUpdate(query,
      scala.collection.mutable.Map[Long, scala.collection.mutable.Map[Int, Long]]())
    epochs.getOrElseUpdate(epoch, scala.collection.mutable.Map[Int, Long]())
      .update(writer, digest)
    val floor = epochs.keys.max - retainedEpochs
    epochs.filterInPlace((e, _) => e >= floor)
    touch(query)
    while (queryTouch.size > retainedQueries) {
      val coldest = queryTouch.minBy(_._2)._1
      seenBatches.remove(coldest)
      queryTouch.remove(coldest)
    }
  }
  private val server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  def host: String = InetAddress.getLoopbackAddress.getHostAddress
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        sock.setTcpNoDelay(true) // small replies must not wait out Nagle
        val t = new Thread(() => serve(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () } // closed during accept
    }
  }, s"queue-broker-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Producer-side convenience (tests publish in-process; a remote
    * producer would use [[QueueBroker.Client.publish]] — same log). */
  def publish(partition: Int, payload: String): Long = logs.synchronized {
    require(partition >= 0 && partition < numPartitions, s"partition $partition")
    logs(partition) += payload
    logs(partition).size - 1L
  }

  /** Round-robin publish across partitions, like a keyless Kafka producer. */
  def publishAll(payloads: Seq[String]): Unit =
    payloads.zipWithIndex.foreach { case (s, i) => publish(i % numPartitions, s) }

  def endOffsets: Seq[Long] = logs.synchronized { logs.map(_.size.toLong).toSeq }

  private def serve(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(sock.getOutputStream, true)
    try {
      var line = in.readLine()
      while (line != null) {
        val parts = line.split(" ")
        parts(0) match {
          case "PARTS" => out.println(s"OK $numPartitions")
          case "END" =>
            out.println(s"OK ${logs.synchronized(logs(parts(1).toInt).size)}")
          case "PUB" =>
            val payload = new String(
              Base64.getDecoder.decode(parts(2)), StandardCharsets.UTF_8)
            out.println(s"OK ${publish(parts(1).toInt, payload)}")
          case "FETCH" =>
            val p = parts(1).toInt
            val from = parts(2).toInt
            val until = parts(3).toInt
            val slice = logs.synchronized(logs(p).slice(from, until).toVector)
            out.println(s"OK ${slice.size}")
            slice.foreach { s =>
              out.println(Base64.getEncoder.encodeToString(
                s.getBytes(StandardCharsets.UTF_8)))
            }
          case "PUBBATCH" =>
            // PUBBATCH <queryId> <epoch> <writer> <n>, then n lines of
            // "<partition> <b64>" — appended atomically, or skipped
            // wholesale when this (query, epoch, writer) batch was
            // already accepted (task/epoch retry)
            val (qid, epoch, writer) =
              (parts(1), parts(2).toLong, parts(3).toInt)
            val n = parts(4).toInt
            val rows = (0 until n).map { _ =>
              val sp = in.readLine().split(" ", 2)
              (sp(0).toInt, new String(
                Base64.getDecoder.decode(sp(1)), StandardCharsets.UTF_8))
            }
            val digest = QueueBroker.batchDigest(rows)
            val badPart = rows.collectFirst {
              case (p, _) if p < 0 || p >= numPartitions => p
            }
            val reply = logs.synchronized {
              if (badPart.isDefined)
                // validate BEFORE any append: a mid-batch failure after
                // earlier rows landed (unrecorded) would duplicate them
                // on the client's retry — the documented contract is
                // appended atomically or skipped wholesale
                s"ERR partition ${badPart.get} out of range [0, $numPartitions)"
              else batchSeen(qid, epoch, writer) match {
                case Some(prev) if prev == digest => "OK 0"
                case Some(_) =>
                  // key replay with DIFFERENT content: the producer's
                  // partitioning changed across a restart — accepting
                  // would lose or duplicate rows, so refuse loudly
                  s"ERR digest mismatch for $qid epoch $epoch writer " +
                    s"$writer: replayed batch content differs from the " +
                    "accepted one (non-deterministic sink partitioning?)"
                case None =>
                  rows.foreach { case (p, s) => logs(p) += s }
                  recordBatch(qid, epoch, writer, digest)
                  s"OK ${rows.size}"
              }
            }
            out.println(reply)
          case other => out.println(s"ERR unknown command $other")
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () } // client went away
    finally { try sock.close() catch { case _: Exception => () } }
  }

  override def close(): Unit = {
    running = false
    try server.close() catch { case _: Exception => () }
  }
}

object QueueBroker {

  /** Order-INSENSITIVE 64-bit content digest of a batch (commutative
    * sum of per-row hashes, each mixing the row's target partition) —
    * computed broker-side on the decoded rows, so it needs no extra
    * protocol field. Multiset equality is deliberate: Spark only
    * guarantees a retried/speculative task re-produces the same SET of
    * rows, not the same arrival order (shuffle fetch order varies
    * across attempts), and an order-sensitive digest would refuse a
    * legal byte-identical-content replay as a mismatch and fail the
    * query permanently. Any changed/added/dropped row (or a row routed
    * to a different partition) still flips the digest. */
  private def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[sources] def batchDigest(rows: Seq[(Int, String)]): Long =
    rows.foldLeft(rows.size.toLong * 1125899906842597L) { case (h, (p, s)) =>
      h + mix64(scala.util.hashing.MurmurHash3.stringHash(s, p).toLong)
    }

  /** Socket client — used on the DRIVER for offset discovery and on
    * EXECUTORS for range fetches ([[QueueSourceProvider]]'s partition
    * readers open their own connections, exactly as a Kafka consumer
    * does per task). */
  final class Client(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    private val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    private val out = new PrintWriter(sock.getOutputStream, true)

    private def request(cmd: String): String = {
      out.println(cmd)
      val resp = in.readLine()
      if (resp == null || !resp.startsWith("OK "))
        throw new java.io.IOException(s"broker error for '$cmd': $resp")
      resp.drop(3)
    }

    def numPartitions: Int = request("PARTS").toInt

    def endOffset(partition: Int): Long = request(s"END $partition").toLong

    def endOffsets(n: Int): Seq[Long] = (0 until n).map(endOffset)

    def publish(partition: Int, payload: String): Long = {
      val b64 = Base64.getEncoder.encodeToString(
        payload.getBytes(StandardCharsets.UTF_8))
      request(s"PUB $partition $b64").toLong
    }

    def fetch(partition: Int, from: Long, until: Long): Vector[String] = {
      val n = request(s"FETCH $partition $from $until").toInt
      Vector.fill(n)(new String(
        Base64.getDecoder.decode(in.readLine()), StandardCharsets.UTF_8))
    }

    /** Idempotent batch publish — the broker accepts a given
      * (queryId, epoch, writer) batch EXACTLY once; retries return 0.
      * `queryId` must contain no whitespace. Returns rows appended. */
    def publishBatch(queryId: String, epoch: Long, writer: Int,
                     rows: Seq[(Int, String)]): Long = {
      out.println(s"PUBBATCH $queryId $epoch $writer ${rows.size}")
      rows.foreach { case (p, s) =>
        out.println(s"$p " + Base64.getEncoder.encodeToString(
          s.getBytes(StandardCharsets.UTF_8)))
      }
      val resp = in.readLine()
      if (resp == null || !resp.startsWith("OK "))
        throw new java.io.IOException(s"broker error for PUBBATCH: $resp")
      resp.drop(3).toLong
    }

    override def close(): Unit = {
      try sock.close() catch { case _: Exception => () }
    }
  }
}
