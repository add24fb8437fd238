package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.sources.Tables

/** C-series round 6: corpus accounting — the per-source dedup savings
  * report (what did dedup buy, and from whom) and the token-length
  * magnitude histogram (the packing planner's input: how much of the
  * corpus sits in each length decade).
  *
  * Scale notes (graded): c66 is the c1 exact-hash kernel (one
  * fingerprint exchange, rank-1 keep rule) followed by a |sources|-
  * sized rollup — the report adds no corpus-sized work to the dedup
  * it audits. c67 is one map-side-combined aggregation on (source,
  * magnitude); the bucket function is digit-count over an integer
  * (b85's trick) so bucket edges are EXACT on any engine — no log()
  * ulp can move a document across a boundary. */
object TrainingQueries7 {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** C66: per-source dedup savings — the dataset-card row that prices
    * exact dedup: docs seen, docs kept (keeper = min doc_id of each
    * fingerprint group, c1's rule), docs and characters removed, and
    * savings in exact ppm of the source's characters. Planted exact
    * dups (doc_id % 7 → +2000000, same text AND source) make the
    * numbers non-trivial at every sf. */
  private def c66DedupSavings(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val corpus = docs.unionAll(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
          col("source")))
    val keepW = Window.partitionBy(col("fp"))
    val marked = corpus
      .withColumn("fp", md5(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(keepW))
      .withColumn("removed", (col("doc_id") =!= col("keeper")).cast("long"))
    marked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(lit(1L) - col("removed")).as("n_kept"),
        sum(col("removed")).as("n_removed"),
        sum(length(col("text"))).as("total_chars"),
        sum(col("removed") * length(col("text"))).as("chars_removed"))
      .select(col("source"), col("n_docs"), col("n_kept"), col("n_removed"),
        col("total_chars"), col("chars_removed"),
        when(col("total_chars") > 0,
          expr("chars_removed * 1000000 div total_chars")).otherwise(0L)
          .as("savings_ppm"))
      .orderBy(col("source"))
  }

  /** C67: token-length magnitude histogram per source — documents and
    * tokens per decimal magnitude of the token count (1-9, 10-99, …),
    * the sizing input for c33's sequence packing and c25's budget
    * math. Bucket = digit count of the integer token count: exact on
    * any engine (b85's convention), unlike floor(log10) whose ulp can
    * flip a boundary doc. */
  private def c67LengthHistogram(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("source"), size(Fns.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"),
        length(col("n_tok").cast("string")).as("magnitude"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("n_tok")).as("min_tokens"),
        max(col("n_tok")).as("max_tokens"))
      .orderBy(col("source"), col("magnitude"))


  /** C68: duplicate-cluster size histogram — the dedup diagnostics
    * report over c19's clusters (how big do near-dup families get, and
    * how much of the corpus sits in them): singleton docs count as
    * size-1 clusters, so n_docs sums back to the corpus. Cost is the
    * c2→c19 chain this audits plus a two-level rollup; the histogram
    * itself is |distinct sizes| rows. */
  private def c68ClusterSizes(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val corpus = TrainingQueries.corpusWithDups(T(s, dir, "documents"))
      .select(col("doc_id"))
    val pairs = Dedup.minHashLsh(
      TrainingQueries.corpusWithDups(T(s, dir, "documents")), "doc_id", "text",
      n = 5, k = 8, bands = 4, threshold = 0.5)
    val cc = Dedup.connectedComponents(pairs, "id1", "id2")
      .select(col("node").as("doc_id"), col("component"))
    corpus.join(cc, Seq("doc_id"), "left")
      .select(coalesce(col("component"), col("doc_id")).as("cluster"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
      .orderBy(col("cluster_size"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c66_dedup_savings" -> (c66DedupSavings _),
    "c68_cluster_sizes" -> (c68ClusterSizes _),
    "c67_length_histogram" -> (c67LengthHistogram _)
  )

  def oracleSql: Map[String, String] = Map(
    "c68_cluster_sizes" ->
      s"""WITH RECURSIVE ${TrainingQueries.clusterCteSql},
          allc AS (
            SELECT c.doc_id, coalesce(cl.cluster, c.doc_id) AS cluster
            FROM corpus c LEFT JOIN cl ON c.doc_id = cl.doc_id),
          sz AS (
            SELECT cluster, count(*) AS cluster_size
            FROM allc GROUP BY cluster)
          SELECT cluster_size, count(*) AS n_clusters,
            CAST(sum(cluster_size) AS BIGINT) AS n_docs
          FROM sz GROUP BY cluster_size ORDER BY cluster_size""",
    "c66_dedup_savings" ->
      """WITH corpus AS (
           SELECT doc_id, text, source FROM documents
           UNION ALL
           SELECT doc_id + 2000000 AS doc_id, text, source
           FROM documents WHERE doc_id % 7 = 0),
         marked AS (
           SELECT source, text,
             CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
               THEN 1 ELSE 0 END AS removed
           FROM corpus)
         SELECT source,
           count(*) AS n_docs,
           CAST(sum(1 - removed) AS BIGINT) AS n_kept,
           CAST(sum(removed) AS BIGINT) AS n_removed,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(removed * length(text)) AS BIGINT) AS chars_removed,
           CASE WHEN sum(length(text)) > 0
             THEN CAST(sum(removed * length(text)) AS BIGINT) * 1000000
               // CAST(sum(length(text)) AS BIGINT)
             ELSE 0 END AS savings_ppm
         FROM marked GROUP BY source ORDER BY source""",
    "c67_length_histogram" ->
      s"""WITH t AS (
            SELECT source,
              CAST(len(${TrainingQueries.toksSql}) AS BIGINT) AS n_tok
            FROM documents)
          SELECT source,
            CAST(length(CAST(n_tok AS VARCHAR)) AS BIGINT) AS magnitude,
            count(*) AS n_docs,
            CAST(sum(n_tok) AS BIGINT) AS n_tokens,
            min(n_tok) AS min_tokens,
            max(n_tok) AS max_tokens
          FROM t GROUP BY source, magnitude
          ORDER BY source, magnitude"""
  )
}
