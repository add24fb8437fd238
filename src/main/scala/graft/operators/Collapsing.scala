package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse CollapsingMergeTree semantics — the third of the three
  * MergeTree table-engine specializations the reference's tables can
  * be created as (clickhouse-batch-client.class.ts:492-568 issues the
  * CREATE TABLE; Summing ≙ [[IncrementalRollup]], Replacing ≙ the
  * b28 latest-version read): writers model state updates by appending
  * a `sign = -1` row that cancels the previously written `+1` row,
  * and a delete by appending a trailing `-1` with nothing after it.
  * The engine collapses matched +1/-1 pairs at merge time; the
  * canonical exact read is `GROUP BY key HAVING sum(sign) > 0` with
  * the argMax-by-version payload.
  *
  * Spark-first shape: one hash shuffle on the key serves BOTH window
  * passes — the whole-partition `sum(sign)` (is the key alive?) and
  * the version-ordered `row_number` (which +1 row is current?). No
  * join, no self-union, no state machine: collapse is pure relational
  * algebra, so it is insensitive to the physical order parts arrive
  * in — exactly the merge-order-independence the CH engine promises.
  * At 100 TB this is the same single-exchange keyed-window shape as
  * sessionization; AQE skew handling applies to hot keys.
  */
object Collapsing {

  /** Collapse a signed write stream to current state: the latest
    * (by `version`, ties by the later `version` columns) `sign = +1`
    * row of every key whose sign total is positive. Keys that net to
    * zero or negative (deleted, or cancel-only garbage) disappear —
    * CH reads them as collapsed-away.
    *
    * Output: the key columns + `payload` columns of the surviving row.
    */
  def collapse(writes: DataFrame, keys: Seq[String], version: Seq[Column],
               sign: Column): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*)
    val ordered = byKey.orderBy(
      (sign.desc +: version.map(_.desc)): _*) // +1 rows first, latest first
    writes
      .withColumn("_net", sum(sign).over(byKey))
      .withColumn("_rk", row_number().over(ordered))
      .filter(col("_net") > 0 && col("_rk") === 1 && sign === 1)
      .drop("_net", "_rk")
  }

  /** CH VersionedCollapsingMergeTree semantics: the writer stamps every
    * state row AND its cancel with the same explicit `version`, so a
    * cancel annihilates exactly its own state row NO MATTER the order
    * parts arrive in — the engine CH recommends once writes can be
    * out of order (plain Collapsing mis-collapses when a cancel lands
    * before its state row in merge order).
    *
    * Relational read: net sign per (key, version) — a version survives
    * iff its +1s outnumber its -1s (normally 1 vs 0) — then ONE
    * surviving +1 row of the highest live version is current (if a
    * writer double-wrote the same version, `tieBreak` picks the later
    * copy deterministically — without it duplicate same-version states
    * would all pass the filter). ONE hash shuffle on the key serves
    * every step: the (key, version) net is a window over the key
    * partition (version is a secondary sort, not a second exchange)
    * and the rank rides the same sort. Arrival-order insensitive by
    * construction — every column the decision reads is
    * order-independent. */
  def collapseVersioned(writes: DataFrame, keys: Seq[String],
                        version: Column, sign: Column,
                        tieBreak: Seq[Column] = Nil): DataFrame = {
    val byKeyVer = Window.partitionBy((keys.map(col) :+ version): _*)
    val byKey = Window.partitionBy(keys.map(col): _*)
    val ordered = byKey.orderBy(
      (col("_live").desc +: version.desc +: tieBreak.map(_.desc)): _*)
    writes
      .withColumn("_vnet", sum(sign).over(byKeyVer))
      .withColumn("_live", (col("_vnet") > 0 && sign === 1).cast("int"))
      .withColumn("_rk", row_number().over(ordered))
      .filter(col("_live") === 1 && col("_rk") === 1)
      .drop("_vnet", "_live", "_rk")
  }
}
