package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the step between corpus prep and the
  * tokenizer/loader: globally shuffle the corpus (so a sequential
  * reader sees an unbiased sample stream) and write bounded-size
  * shards a data loader can fan out over.
  *
  * Spark-first determinism: the "shuffle" is a total order by
  * `md5(salt # id)` — a reproducible permutation, not an RNG. Same
  * salt → same shard contents on every run, on any cluster layout
  * (the property `orderBy(rand())` lacks); changing the salt is a
  * fresh epoch permutation. The global sort is one range exchange —
  * the unavoidable cost of a true corpus shuffle — and
  * `maxRecordsPerFile` splits each sort partition into byte-bounded
  * shards without a second pass. At 100 TB: size
  * `spark.sql.shuffle.partitions` so sort partitions land near the
  * shard size, and the write is sort → stream-out with no extra
  * materialization.
  */
object Exporter {

  /** Write `df` as shuffled shards under `dir`. `rowsPerShard` bounds
    * each file; `salt` selects the epoch permutation. */
  def writeShuffledShards(df: DataFrame, idCol: String, dir: String,
                          rowsPerShard: Int, salt: String = "epoch0",
                          format: String = "parquet"): Unit = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    df.withColumn("__shuffle_key",
        md5(concat_ws("#", lit(salt), col(idCol).cast("string"))))
      .orderBy(col("__shuffle_key"))
      .drop("__shuffle_key")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerShard.toLong)
      .format(format)
      .save(dir)
  }

  /** Read the shard set back (order across shards follows the file
    * naming the sorted write produced). */
  def readShards(spark: SparkSession, dir: String,
                 format: String = "parquet"): DataFrame =
    spark.read.format(format).load(dir)
}
