package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "payload-one"), (2L, "a longer payload with more bytes in it"), (3L, "")
  ).toDF("media_id", "payload")

  test("column path: binary blob + typed metadata struct columns") {
    val out = Multimodal.withMedia(media, "media_id", col("payload"))
      .orderBy("media_id").collect()
    assert(out(0).getAs[Array[Byte]]("media_blob").length == 11)
    assert(out(0).getAs[Long]("byte_len") == 11L)
    assert(out(0).getAs[Long]("width") == 11L % 640L + 1L)
    assert(out(2).getAs[Long]("byte_len") == 0L) // empty payload survives
    assert(out(0).getAs[String]("feature_md5").length == 32)
  }

  test("mapPartitions batch path produces identical metadata to column path") {
    val colPath = Multimodal.withMedia(media, "media_id", col("payload"))
      .select(col("media_id"), col("byte_len"), col("width"), col("height"),
        col("channels"), col("n_frames"), col("feature_md5"))
    val batchPath = Multimodal.decodeStubBatched(
      Multimodal.withMedia(media, "media_id", col("payload"))
        .select(col("media_id"), col("media_blob")),
      "media_id", "media_blob")
    assert(colPath.orderBy("media_id").collect().toSeq ==
      batchPath.orderBy("media_id").collect().toSeq)
  }
}
