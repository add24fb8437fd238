package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Streaming twin of c76: micro-batches of new docs flagged against a
  * static reference corpus. Asserts batch-parity with the batch
  * operator, cross-batch independence (a dup arriving in a later
  * trigger still flags), and that within-stream twins do NOT flag —
  * the cross-corpus contract. */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches flag against the static reference; within-stream twins pass") {
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about spark query engines and columnar formats here")
    ).toDF("doc_id", "text")

    val b1 = Seq(
      // near-dup of ref 1 → flags
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (11L, "totally novel sentences describing embedding sketches and banded joins at scale"))
    val b2 = Seq(
      // dup of ref arriving one TRIGGER later → still flags
      (20L, "the quick brown fox jumps over the lazy dog near the river bank today also"),
      // twin of batch-1's doc 11 — within-stream, novel vs ref → passes
      (21L, "totally novel sentences describing embedding sketches and banded joins at scale"))

    val dir = tmpDir("singest")
    // one file per micro-batch (maxFilesPerTrigger=1)
    b1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/b1")
    b2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/b2")

    val stream = spark.readStream
      .schema(ref.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/*")
    val q = StreamingIngest.flagAgainstReference(stream, ref,
      "doc_id", "text", s"$dir/out", s"$dir/ck", threshold = 0.5)
    q.awaitTermination()

    val out = spark.read.parquet(s"$dir/out")
      .select(col("doc_id"), col("is_dup"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(10L -> 1L, 11L -> 0L, 20L -> 1L, 21L -> 0L))

    // batch parity: the streaming flags equal the one-shot operator's
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val batchFlags = graft.operators.Dedup
      .crossCorpusFlags(all, ref, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("is_dup")).toMap
    assert(out === batchFlags)

    // replay idempotence: wipe the checkpoint so EVERY batch replays
    // against the existing output dir — the per-partition dynamic
    // overwrite must rewrite the same rows, not append duplicates
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/ck"))
    val q2 = StreamingIngest.flagAgainstReference(stream, ref,
      "doc_id", "text", s"$dir/out", s"$dir/ck", threshold = 0.5)
    q2.awaitTermination()
    val replayed = spark.read.parquet(s"$dir/out")
      .select(col("doc_id"), col("is_dup"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(replayed.length === 4, "replay must overwrite, not append")
    assert(replayed.toMap === out)
  }
}
