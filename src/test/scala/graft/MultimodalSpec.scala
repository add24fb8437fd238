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

  test("resize stub: aspect-preserving fit, small media untouched") {
    val meta = Multimodal.withMedia(media, "media_id", col("payload"))
    val out = Multimodal.resizeStub(meta, maxW = 4L, maxH = 2L)
      .orderBy("media_id").collect()
    out.foreach { r =>
      val (w, h) = (r.getAs[Long]("resized_width"), r.getAs[Long]("resized_height"))
      assert(w <= 4L && h <= 2L && w >= 1L && h >= 1L)
    }
    // no-op when already inside the box
    val small = Multimodal.resizeStub(meta, maxW = 100000L, maxH = 100000L)
      .orderBy("media_id").collect()
    assert(small(0).getAs[Long]("resized_width") == small(0).getAs[Long]("width"))
  }

  test("frame-sample stub: every k-th frame, bounded array") {
    val meta = Multimodal.withMedia(media, "media_id", col("payload"))
    val out = Multimodal.sampleFramesStub(meta, everyK = 3L)
      .orderBy("media_id").collect()
    out.foreach { r =>
      val frames = r.getAs[scala.collection.Seq[Long]]("sampled_frames")
      val n = r.getAs[Long]("n_frames")
      assert(frames.toSeq == (0L until n by 3L).toSeq)
      assert(r.getAs[Long]("n_sampled") == frames.length.toLong)
    }
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

  test("featureStub: fixed-dim, bounded, deterministic, digest-sensitive") {
    val featured = Multimodal.featureStub(
      Multimodal.withMedia(media, "media_id", col("payload")), dim = 16)
    val rows = featured.select(col("media_id"), col("feature_vec"))
      .orderBy("media_id").collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length == 16)
      assert(v.forall(x => x >= -1.0 && x <= 1.0))
    }
    // deterministic: same input → same vector; distinct payloads differ
    val again = Multimodal.featureStub(
      Multimodal.withMedia(media, "media_id", col("payload")), dim = 16)
      .select(col("media_id"), col("feature_vec")).orderBy("media_id").collect()
    assert(rows.map(_.getSeq[Double](1)).toSeq == again.map(_.getSeq[Double](1)).toSeq)
    assert(rows.map(_.getSeq[Double](1)).distinct.length == rows.length)
  }
}
