package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Token-window document chunking — the sequence-packing prep step of
  * a training pipeline (split long documents into model-context-sized
  * overlapping windows).
  *
  * Pure generator shape: tokenize once, explode one chunk-index
  * sequence per doc, slice. Row growth is len/stride per doc (bounded,
  * data-proportional); no shuffle at all — chunking pipelines into
  * whatever comes next (dedup, tokenizer, writer) and the parquet
  * scan stays one pass even at 100 TB.
  */
object Chunker {

  /** Chunk `textCol` into windows of `size` tokens advancing by
    * `stride` (stride < size ⇒ overlap). A chunk starts at every
    * stride multiple below the token count, so the final window may be
    * short (`n_tokens` carries its actual length). Empty/null texts
    * produce no chunks. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    val toks = Fns.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__tk"))
      .filter(size_(col("__tk")) > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          floor((size_(col("__tk")) - 1) / stride).cast("long"))))
      .select(col(idCol), col("chunk_id"),
        slice(col("__tk"), (col("chunk_id") * stride + 1).cast("int"), lit(size))
          .as("chunk_tokens"))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
