package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "payload-one"), (2L, "a longer payload with more bytes in it"), (3L, "")
  ).toDF("media_id", "payload")

  test("column path: container header + payload, metadata parsed back out") {
    val out = Multimodal.withMedia(media, "media_id", col("payload"))
      .orderBy("media_id").collect()
    // id 1 is odd -> JPEG container: 21-byte SOI+SOF0 header + 11 payload
    assert(out(0).getAs[Array[Byte]]("media_blob").length == 32)
    assert(out(0).getAs[String]("media_kind") == "jpeg")
    assert(out(0).getAs[Long]("byte_len") == 32L)
    assert(out(0).getAs[Long]("width") == 11L % 640L + 1L)
    assert(out(0).getAs[Long]("bit_depth") == 8L)
    assert(out(0).getAs[Long]("channels") == 3L)
    // id 2 is even -> PNG: signature + IHDR = 33 bytes of header
    val plen2 = "a longer payload with more bytes in it".length.toLong
    assert(out(1).getAs[String]("media_kind") == "png")
    assert(out(1).getAs[Long]("byte_len") == 33L + plen2)
    assert(out(1).getAs[Long]("width") == plen2 % 640L + 1L)
    assert(out(2).getAs[Long]("byte_len") == 21L) // empty payload survives
    assert(out(0).getAs[String]("feature_md5").length == 32)
    // feature digest fingerprints the PAYLOAD, not the container
    assert(out(0).getAs[String]("feature_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("payload-one".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("PNG golden bytes: a hand-built 3x2 RGBA header parses exactly") {
    val ihdrData = Array[Byte](0, 0, 0, 3, 0, 0, 0, 2, 16, 6, 0, 0, 0)
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
        0, 0, 0, 13).map(_.toByte) ++
      "IHDR".getBytes("US-ASCII") ++ ihdrData ++
      Array[Byte](1, 2, 3, 4) ++ "pixels".getBytes("US-ASCII")
    val df = Seq((1L, png)).toDF("media_id", "media_blob")
    val got = Multimodal.decodeStubBatched(df, "media_id", "media_blob")
      .collect().head
    assert(got.getAs[String]("media_kind") == "png")
    assert(got.getAs[Long]("width") == 3L)
    assert(got.getAs[Long]("height") == 2L)
    assert(got.getAs[Long]("bit_depth") == 16L)
    assert(got.getAs[Long]("channels") == 4L) // color type 6 = RGBA
  }

  test("JPEG marker walk skips APP0/DQT segments before SOF0") {
    // SOI, APP0 (len 4 incl itself -> 2 data bytes), DQT (len 3),
    // then SOF0 with precision 8, height 258, width 515, 1 component
    val jpeg = Array(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0xAA, 0xBB,
      0xff, 0xdb, 0x00, 0x03, 0xCC,
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x01, 0x02, 0x02, 0x03, 0x01)
      .map(_.toByte) ++ "rest".getBytes("US-ASCII")
    val df = Seq((1L, jpeg)).toDF("media_id", "media_blob")
    val got = Multimodal.decodeStubBatched(df, "media_id", "media_blob")
      .collect().head
    assert(got.getAs[String]("media_kind") == "jpeg")
    assert(got.getAs[Long]("height") == 258L)
    assert(got.getAs[Long]("width") == 515L)
    assert(got.getAs[Long]("bit_depth") == 8L)
    assert(got.getAs[Long]("channels") == 1L)
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
      .select(col("media_id"), col("media_kind"), col("byte_len"),
        col("width"), col("height"), col("bit_depth"),
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
