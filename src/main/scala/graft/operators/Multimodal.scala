package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batch.
  *
  * The container has no image codecs, so PIXEL decode stays a declared
  * stub — but the CONTAINER layer is real: blobs carry genuine PNG /
  * JPEG headers (synthesized deterministically from the payload so the
  * DuckDB oracle can mirror the values), and the decode step parses
  * those magic bytes exactly as a production reader would — PNG
  * signature + IHDR fields (width/height/bit-depth/color-type per the
  * PNG spec's fixed first-chunk layout), JPEG SOI + an SOF marker walk
  * (the batched path skips unrelated segments by their length fields,
  * as a real demuxer must). Everything Spark-side is real too: the
  * binary column, the metadata struct schema, the mapPartitions batch
  * shape (the Scala analogue of `mapInPandas`: per-partition batches,
  * one decoder init per partition, never per row), and the
  * partitioning story (media blobs hash-partition on id; metadata
  * stays columnar so pruning works). The one remaining synthesized
  * field is `n_frames` — still images don't carry a frame count, so
  * it models the video-container case with payload arithmetic.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_kind", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("bit_depth", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("feature_md5", StringType, nullable = false)))

  // ---- container synthesis (the deterministic test-image writer) ----

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  /** PNG: 8-byte signature, then the IHDR chunk (len=13, type, 4-byte
    * width, 4-byte height, bit depth, color type 2 = truecolor RGB,
    * compression/filter/interlace = 0, 4-byte CRC — zeroed: the parse
    * layer here reads fields, it doesn't checksum). 33 bytes. */
  private val PngHeaderLen = 33
  /** JPEG: SOI (FFD8) then a spec-complete SOF0 baseline frame header
    * — marker FFC0, 2-byte segment length (17 = 8 + 3·components),
    * 1-byte precision (8), 2-byte height, 2-byte width, 1-byte
    * component count (3), and three 3-byte component specs
    * (id, 1×1 sampling, quant table 0). 21 bytes; the length field is
    * honest, so a demuxer skipping segments by length lands exactly
    * on the payload. */
  private val JpegHeaderLen = 21

  /** Big-endian fixed-width bytes of an integral column — the byte
    * order every image container uses. */
  private def be(n: Column, bytes: Int): Column =
    unhex(lpad(hex(n.cast("bigint")), bytes * 2, "0"))

  /** A real PNG signature + IHDR for (w, h), 8-bit RGB. */
  def pngHeader(w: Column, h: Column): Column =
    concat(lit(PngSig), be(lit(13L), 4), lit("IHDR".getBytes("US-ASCII")),
      be(w, 4), be(h, 4), be(lit(8L), 1), be(lit(2L), 1),
      be(lit(0L), 1), be(lit(0L), 1), be(lit(0L), 1), be(lit(0L), 4))

  /** A real JPEG SOI + SOF0 frame header for (w, h), 8-bit, 3 comps. */
  def jpegHeader(w: Column, h: Column): Column =
    concat(unhex(lit("FFD8FFC0001108")), be(h, 2), be(w, 2),
      unhex(lit("03011100021100031100")))

  // ---- decode: parse the container's magic bytes ----

  /** Column-form decode: detect the container from its signature and
    * read width/height/bit-depth/channels out of the actual header
    * bytes (PNG: IHDR is the mandatory FIRST chunk, so its offsets
    * are fixed by spec; JPEG: the column form assumes SOF first — the
    * synthesized stream's shape — while [[decodeBatched]] does the
    * general marker walk). `feature_md5` fingerprints the PAYLOAD
    * (the bytes after the header): that is the content a model
    * forward pass would embed, and it keeps the digest independent
    * of which container wrapped it. */
  def decodeStubCols(blob: Column): Seq[(String, Column)] = {
    val isPng = blob.substr(lit(1), lit(8)) === lit(PngSig)
    val isJpeg = blob.substr(lit(1), lit(4)) ===
      lit(Array(0xff, 0xd8, 0xff, 0xc0).map(_.toByte))
    def beInt(pos: Int, len: Int): Column =
      conv(hex(blob.substr(lit(pos), lit(len))), 16, 10).cast("bigint")
    val kind = when(isPng, "png").when(isJpeg, "jpeg").otherwise("unknown")
    val hdrLen = when(isPng, PngHeaderLen).when(isJpeg, JpegHeaderLen)
      .otherwise(0).cast("bigint")
    val payload = blob.substr(hdrLen + 1, length(blob).cast("bigint"))
    val plen = length(blob).cast("bigint") - hdrLen
    Seq(
      "media_kind" -> kind,
      "byte_len" -> length(blob).cast("bigint"),
      "width" -> when(isPng, beInt(17, 4)).when(isJpeg, beInt(10, 2))
        .otherwise(0L),
      "height" -> when(isPng, beInt(21, 4)).when(isJpeg, beInt(8, 2))
        .otherwise(0L),
      "bit_depth" -> when(isPng, beInt(25, 1)).when(isJpeg, beInt(7, 1))
        .otherwise(0L),
      // PNG color type → samples/pixel: 0 gray, 2 RGB, 4 gray+A, 6 RGBA
      "channels" -> when(isPng,
          when(beInt(26, 1) === 2, 3L).when(beInt(26, 1) === 6, 4L)
            .when(beInt(26, 1) === 4, 2L).otherwise(1L))
        .when(isJpeg, beInt(12, 1)).otherwise(0L),
      "n_frames" -> (plen % 16L + 1L),
      "feature_md5" -> md5(payload))
  }

  /** Batched decode — the mapPartitions path a real codec needs
    * (decoder init once per partition, rows streamed through). The
    * JPEG branch does the REAL demuxer walk: skip segments by their
    * 2-byte lengths until an SOF marker (C0-CF minus C4/C8/CC), so it
    * reads streams with APPn/DQT/DHT segments before the frame header
    * — not just the fixed synthesized layout. Values match
    * [[decodeStubCols]] on synthesized blobs, so both paths are
    * interchangeable and cross-checked in tests. */
  def decodeStubBatched(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val nullableMeta = mediaMetaSchema.fields.map(_.copy(nullable = true))
    val outSchema = StructType(
      StructField("media_id", LongType, nullable = true) +: nullableMeta.toIndexedSeq)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      // Real codecs initialize here, once per partition / batch.
      val md = java.security.MessageDigest.getInstance("MD5")
      def u(b: Byte): Int = b & 0xff
      def be(bs: Array[Byte], pos: Int, len: Int): Long =
        (pos until pos + len).foldLeft(0L)((a, i) => (a << 8) | u(bs(i)))
      rows.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) // null blob -> null metadata, same as the column path
          Row(id, null, null, null, null, null, null, null, null)
        else {
          val isPng = bytes.length >= PngHeaderLen &&
            PngSig.indices.forall(i => bytes(i) == PngSig(i))
          val isJpeg = bytes.length >= 4 &&
            u(bytes(0)) == 0xff && u(bytes(1)) == 0xd8 && u(bytes(2)) == 0xff
          val (kind, w, h, depth, ch, hdr) =
            if (isPng)
              ("png", be(bytes, 16, 4), be(bytes, 20, 4), be(bytes, 24, 1),
                u(bytes(25)) match { case 2 => 3L; case 6 => 4L; case 4 => 2L; case _ => 1L },
                PngHeaderLen)
            else if (isJpeg) {
              // marker walk: FF xx [2-byte length including itself]
              var i = 2
              var sof = -1
              while (sof < 0 && i + 3 < bytes.length && u(bytes(i)) == 0xff) {
                val m = u(bytes(i + 1))
                if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
                  sof = i
                else i += 2 + be(bytes, i + 2, 2).toInt
              }
              if (sof >= 0 && sof + 9 < bytes.length)
                ("jpeg", be(bytes, sof + 7, 2), be(bytes, sof + 5, 2),
                  be(bytes, sof + 4, 1), be(bytes, sof + 9, 1),
                  sof + 2 + be(bytes, sof + 2, 2).toInt)
              else ("unknown", 0L, 0L, 0L, 0L, 0)
            } else ("unknown", 0L, 0L, 0L, 0L, 0)
          val payload = java.util.Arrays.copyOfRange(bytes, hdr, bytes.length)
          val hex = md.digest(payload).map("%02x".format(_)).mkString
          Row(id, kind, bytes.length.toLong, w, h, depth, ch,
            payload.length.toLong % 16L + 1L, hex)
        }
      }
    }(enc)
  }

  /** STUB resize: a real implementation re-encodes the pixel buffer;
    * the stub scales the metadata deterministically and re-fingerprints
    * with the target box salted in. The Spark-side shape — metadata
    * struct in, metadata struct out, pure projection, no shuffle — is
    * the real one. Aspect-preserving fit into (maxW, maxH). */
  def resizeStub(df: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val scaleNum = least(lit(maxW) * col("height"), lit(maxH) * col("width"))
    val scaleDen = col("width") * col("height")
    val fit = col("width") <= maxW && col("height") <= maxH
    df.withColumn("resized_width",
        when(fit, col("width"))
          .otherwise(greatest(lit(1L), floor(col("width") * scaleNum / scaleDen))))
      .withColumn("resized_height",
        when(fit, col("height"))
          .otherwise(greatest(lit(1L), floor(col("height") * scaleNum / scaleDen))))
      .withColumn("resized_md5",
        md5(concat_ws("x", col("feature_md5"), lit(maxW), lit(maxH))))
  }

  /** STUB frame sampling: every k-th frame index up to n_frames — the
    * real op slices the container; the plumbing (per-row bounded array
    * of frame descriptors, ready to explode into a frames table) is
    * what a video pipeline needs from Spark. */
  def sampleFramesStub(df: DataFrame, everyK: Long): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    df.withColumn("sampled_frames",
      sequence(lit(0L), col("n_frames") - 1, lit(everyK)))
      .withColumn("n_sampled", size(col("sampled_frames")).cast("bigint"))
  }

  /** STUB feature extraction: a fixed-dim double embedding derived
    * deterministically from the media digest — byte i of the md5,
    * centered and scaled to [−1, 1]. A real extractor replaces the
    * arithmetic with a model forward pass; the Spark-side shape — a
    * bounded array column ready for [[Similarity]]'s ANN kernels —
    * is exactly what the media→embedding→search bridge needs, and
    * the hex arithmetic is engine-exact (mirrored in the DuckDB
    * oracle). Requires a `feature_md5` column (from the decode step). */
  def featureStub(df: DataFrame, dim: Int = 16): DataFrame = {
    require(dim >= 1 && dim <= 16, "the md5 digest yields 16 bytes")
    val vals = (0 until dim).map { i =>
      ((expr(s"(instr('0123456789abcdef', substr(feature_md5, ${2 * i + 1}, 1)) - 1) * 16" +
        s" + instr('0123456789abcdef', substr(feature_md5, ${2 * i + 2}, 1)) - 1")
        .cast("double") - lit(127.5)) / lit(127.5))
    }
    df.withColumn("feature_vec", array(vals: _*))
  }

  /** Attach a binary media column + decoded metadata to a table: wrap
    * the payload in a REAL container header (PNG for even ids, JPEG
    * for odd — both parsers stay exercised), then run the decode over
    * the blob. Dimensions are payload-length arithmetic so the oracle
    * mirrors them without a binary parser — but the Spark-side values
    * are read BACK out of the header bytes by [[decodeStubCols]], so
    * a parse bug breaks the driver row instead of cancelling out. */
  def withMedia(df: DataFrame, idCol: String, payload: Column): DataFrame = {
    val pl = payload.cast("string")
    val bytes = encode(pl, "UTF-8")
    val w = length(bytes).cast("bigint") % 640L + 1L
    val h = length(bytes).cast("bigint") * 7L % 480L + 1L
    val blob = concat(
      when(col(idCol).cast("bigint") % 2 === 0, pngHeader(w, h))
        .otherwise(jpegHeader(w, h)),
      bytes)
    val metas = decodeStubCols(col("media_blob"))
    metas.foldLeft(df.withColumn("media_blob", blob)) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
  }
}
