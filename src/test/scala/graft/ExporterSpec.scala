package graft

import org.apache.spark.sql.functions._
import graft.operators.Exporter

/** Shard export: bounded shard sizes, nothing lost, deterministic
  * permutation per salt, different permutation per epoch. */
class ExporterSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0 until 950).map(i => (i.toLong, s"doc $i"))
    .toDF("doc_id", "text")

  test("shards are bounded, complete, and reproducible per salt") {
    val out1 = tmpDir("shards") + "/e0"
    Exporter.writeShuffledShards(docs, "doc_id", out1, rowsPerShard = 100)

    val files = new java.io.File(out1).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    // every shard respects the bound
    files.foreach { f =>
      assert(spark.read.parquet(f.getPath).count() <= 100L,
        s"${f.getName} exceeds rowsPerShard")
    }
    // nothing lost or duplicated
    val back = Exporter.readShards(spark, out1)
    assert(back.count() == 950)
    assert(back.select("doc_id").distinct().count() == 950)

    // same salt → byte-identical permutation on a second export
    val out2 = tmpDir("shards") + "/e0again"
    Exporter.writeShuffledShards(docs, "doc_id", out2, rowsPerShard = 100)
    def seq(dir: String): Seq[Long] = {
      val sk = md5(concat_ws("#", lit("epoch0"), col("doc_id").cast("string")))
      Exporter.readShards(spark, dir).orderBy(sk)
        .select("doc_id").as[Long].collect().toSeq
    }
    assert(seq(out1) === seq(out2))
  }

  test("a different salt is a different epoch permutation") {
    val a = tmpDir("shards") + "/ea"
    val b = tmpDir("shards") + "/eb"
    Exporter.writeShuffledShards(docs, "doc_id", a, 200, salt = "epoch1")
    Exporter.writeShuffledShards(docs, "doc_id", b, 200, salt = "epoch2")
    // shard 0 of each epoch holds different leading docs
    def first(dir: String): Seq[Long] = {
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).head
      spark.read.parquet(f.getPath).select("doc_id").as[Long].collect().toSeq
    }
    assert(first(a) !== first(b))
  }
}
