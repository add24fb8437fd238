package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batch.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stub — but everything Spark-side is
  * real: the binary column, the metadata struct schema, the
  * mapPartitions batch shape (the Scala analogue of `mapInPandas`:
  * per-partition batches, one decoder init per partition, never per
  * row), and the partitioning story (media blobs hash-partition on id;
  * metadata stays columnar so pruning works).
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("feature_md5", StringType, nullable = false)))

  /** STUB decode, column form: deterministic pseudo-metadata from the
    * bytes (length/md5 arithmetic standing in for a real codec). The
    * expression shape — binary in, struct of typed metadata out — is
    * exactly what a real decoder expression would have. */
  def decodeStubCols(blob: org.apache.spark.sql.Column): Seq[(String, org.apache.spark.sql.Column)] = {
    val len = length(blob).cast("bigint")
    Seq(
      "byte_len" -> len,
      "width" -> (len % 640L + 1L),
      "height" -> (len * 7L % 480L + 1L),
      "channels" -> lit(3L),
      "n_frames" -> (len % 16L + 1L),
      "feature_md5" -> md5(blob))
  }

  /** STUB decode, mapPartitions form — the batch path a real codec
    * needs (decoder init once per partition, rows streamed through).
    * Output values match [[decodeStubCols]] so both paths are
    * interchangeable and cross-checked in tests. */
  def decodeStubBatched(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val nullableMeta = mediaMetaSchema.fields.map(_.copy(nullable = true))
    val outSchema = StructType(
      StructField("media_id", LongType, nullable = true) +: nullableMeta.toIndexedSeq)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long"), col(blobCol)).mapPartitions { rows =>
      // Real codecs initialize here, once per partition / batch.
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) // null blob -> null metadata, same as the column path
          Row(id, null, null, null, null, null, null)
        else {
          val len = bytes.length.toLong
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          Row(id, len, len % 640L + 1L, len * 7L % 480L + 1L, 3L, len % 16L + 1L, hex)
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

  /** Attach a binary media column + decoded metadata to a table. */
  def withMedia(df: DataFrame, idCol: String, payload: org.apache.spark.sql.Column): DataFrame = {
    val blob = encode(payload, "UTF-8")
    val metas = decodeStubCols(blob)
    metas.foldLeft(df.withColumn("media_blob", blob)) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
  }
}
