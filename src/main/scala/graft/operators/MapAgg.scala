package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse `sumMap` — key-wise sums of map-typed columns per group
  * (the CH idiom for sparse per-entity counters: each row carries a
  * small `Map(counter → delta)`, the aggregate unions keys and sums
  * values; reference tables feed exactly this dashboard shape once
  * events land, clickhouse-batch-client.class.ts:492-568).
  *
  * Spark-first shape: a MapType UDAF would carry whole maps through
  * the shuffle and merge them in JVM objects. The relational rewrite —
  * explode to (group, key, value) rows, ONE hash aggregate, reassemble
  * the map only at the end — keeps everything codegen'd, partial-agg
  * friendly (map-side combine on (group, mkey)), and the shuffle
  * payload is one scalar row per live counter, never a serialized map.
  * At 100 TB the cost is a single exchange on (group, mkey) whose
  * width is the number of DISTINCT live counters, not row count.
  */
object MapAgg {

  /** Key-wise sum, exploded form: one `(groupKeys…, mkey, mval_sum)`
    * row per live map key. This is the aggregation itself — prefer it
    * whenever the consumer joins/filters on counter names, and skip
    * the map reassembly entirely. Null/empty maps contribute nothing
    * (CH sumMap semantics). */
  def sumMapExploded(df: DataFrame, groupKeys: Seq[String], m: Column): DataFrame =
    aggMapExploded(df, groupKeys, m, sum, "mval_sum")

  /** CH minMap / maxMap — same explode-aggregate shape, key-wise
    * min/max instead of sum (the "first/last seen per counter" and
    * "peak value per counter" dashboard idioms). */
  def minMapExploded(df: DataFrame, groupKeys: Seq[String], m: Column): DataFrame =
    aggMapExploded(df, groupKeys, m, min, "mval_min")

  def maxMapExploded(df: DataFrame, groupKeys: Seq[String], m: Column): DataFrame =
    aggMapExploded(df, groupKeys, m, max, "mval_max")

  private def aggMapExploded(df: DataFrame, groupKeys: Seq[String], m: Column,
                             agg: Column => Column, outName: String): DataFrame =
    df.select(groupKeys.map(col) :+ explode(m).as(Seq("mkey", "mval")): _*)
      .groupBy((groupKeys :+ "mkey").map(col): _*)
      .agg(agg(col("mval")).as(outName))

  /** CH-shaped result: one row per group with the summed map,
    * key-sorted so downstream digests/compares are deterministic.
    * The reassembly `collect_list` sees one row per live counter of
    * the group (already aggregated) — bounded by the counter
    * vocabulary, not by event count. */
  def sumMap(df: DataFrame, groupKeys: Seq[String], m: Column): DataFrame =
    sumMapExploded(df, groupKeys, m)
      .groupBy(groupKeys.map(col): _*)
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("mkey"), col("mval_sum")))))
        .as("summed_map"))
}
