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

  test("column path walks APPn/DQT segments too — parity with batched " +
       "on non-synthesized JPEGs") {
    // same stream shape as the batched-walk test: SOI, APP0, DQT, SOF0
    val realJpeg = Array(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0xAA, 0xBB,
      0xff, 0xdb, 0x00, 0x03, 0xCC,
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x01, 0x02, 0x02, 0x03, 0x01)
      .map(_.toByte) ++ "rest".getBytes("US-ASCII")
    // plus a truncated SOI-only stream and a non-media blob: both
    // paths must agree they are "unknown"
    val blobs = Seq((1L, realJpeg),
      (2L, Array(0xff, 0xd8, 0xff).map(_.toByte)),
      (3L, "not an image".getBytes("US-ASCII")))
      .toDF("media_id", "media_blob")
    val cols = Multimodal.decodeStubCols(col("media_blob"))
    val colPath = blobs.select(col("media_id") +:
      cols.map { case (n, c) => c.as(n) }: _*)
    val batched = Multimodal.decodeStubBatched(blobs, "media_id", "media_blob")
      .select(colPath.columns.map(col): _*)
    val a = colPath.orderBy("media_id").collect().toSeq
    val b = batched.orderBy("media_id").collect().toSeq
    assert(a == b, s"paths diverged:\ncolumn:  $a\nbatched: $b")
    assert(a.head.getAs[String]("media_kind") == "jpeg")
    assert(a.head.getAs[Long]("width") == 515L) // parsed PAST the APP0/DQT
    assert(a(1).getAs[String]("media_kind") == "unknown")
    assert(a(2).getAs[String]("media_kind") == "unknown")
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

  test("PNG pixel round-trip: encode → CRC walk + inflate + unfilter " +
       "recovers the synthesis formula exactly") {
    // heights ≥ 5 exercise all five filter types; include a 1x1 and a
    // width-1 (no left neighbor on any pixel) edge
    val dims = Seq((1L, 7L, 6L), (2L, 1L, 1L), (3L, 1L, 9L), (4L, 13L, 5L))
      .toDF("media_id", "width", "height")
    val out = Multimodal.decodePngPixelsBatched(
      Multimodal.encodePngBatched(dims, "media_id", "width", "height"),
      "media_id", "png_blob").orderBy("media_id").collect()
    Seq((1L, 7L, 6L), (2L, 1L, 1L), (3L, 1L, 9L), (4L, 13L, 5L))
      .zip(out).foreach { case ((id, w, h), r) =>
        val n = w * h * 3
        val expSum = (0L until n).map(k => (k + w + 7 * h) % 256).sum
        val expSq = (0L until n).map { k =>
          val v = (k + w + 7 * h) % 256; v * v }.sum
        assert(r.getAs[Long]("media_id") == id)
        assert(r.getAs[Long]("n_samples") == n)
        assert(r.getAs[Long]("pixel_sum") == expSum, s"pixel_sum for id=$id")
        assert(r.getAs[Long]("pixel_sq_sum") == expSq, s"pixel_sq_sum id=$id")
      }
  }

  test("encoded PNGs are spec-valid: ImageIO (an independent decoder) " +
       "reads identical pixels") {
    val dims = Seq((1L, 7L, 6L), (2L, 13L, 5L)).toDF("media_id", "width", "height")
    val blobs = Multimodal.encodePngBatched(dims, "media_id", "width", "height")
      .orderBy("media_id").collect()
    blobs.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("png_blob")))
      assert(img != null, "ImageIO could not parse the blob")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h.toInt; x <- 0 until w.toInt) {
        val k = (y.toLong * w + x) * 3
        val exp = ((k + w + 7 * h) % 256, (k + 1 + w + 7 * h) % 256,
          (k + 2 + w + 7 * h) % 256)
        val rgb = img.getRGB(x, y)
        val got = (((rgb >> 16) & 0xff).toLong, ((rgb >> 8) & 0xff).toLong,
          (rgb & 0xff).toLong)
        assert(got == exp, s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("decoder is general, not encoder-tuned: PNGs written by ImageIO " +
       "(its own filter/IDAT choices) decode to the same pixel sums") {
    val (w, h) = (23, 9)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val k = (y * w + x) * 3
      def p(i: Int): Int = (k + i + w + 7 * h) % 256
      img.setRGB(x, y, (p(0) << 16) | (p(1) << 8) | p(2))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val df = Seq((1L, bos.toByteArray)).toDF("media_id", "media_blob")
    val got = Multimodal.decodePngPixelsBatched(df, "media_id", "media_blob")
      .collect().head
    val n = w * h * 3
    val expSum = (0 until n).map(k => (k + w + 7 * h) % 256).sum.toLong
    val expSq = (0 until n).map { k =>
      val v = (k + w + 7 * h) % 256; v.toLong * v }.sum
    assert(got.getAs[Long]("width") == w && got.getAs[Long]("height") == h)
    assert(got.getAs[Long]("pixel_sum") == expSum)
    assert(got.getAs[Long]("pixel_sq_sum") == expSq)
  }

  test("pixel decode rejects garbage without throwing: null stats") {
    val bad = Seq(
      (1L, "not a png".getBytes("US-ASCII")),
      (2L, null.asInstanceOf[Array[Byte]]),
      // valid signature+IHDR but corrupted IDAT CRC
      (3L, {
        val ok = Multimodal.encodePngBatched(
          Seq((9L, 4L, 4L)).toDF("media_id", "width", "height"),
          "media_id", "width", "height").collect().head
          .getAs[Array[Byte]]("png_blob").clone()
        ok(ok.length - 10) = (ok(ok.length - 10) ^ 0x5a).toByte // corrupts the IEND chunk header
        ok
      })).toDF("media_id", "png_blob")
    val out = Multimodal.decodePngPixelsBatched(bad, "media_id", "png_blob")
      .orderBy("media_id").collect()
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("pixel_sum")),
        s"garbage blob ${r.getAs[Long]("media_id")} produced stats")
    }
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
