package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every left row, the most recent
  * right row with the same key at or before the left row's time.
  *
  * Spark-first shape: NOT a range join (whose candidate set explodes
  * with per-key row counts) — a tagged union + one keyed sort window.
  * Right rows sort before left rows at equal timestamps (≤ semantics),
  * and `last(..., ignoreNulls)` over the running frame carries each
  * right value forward to every later left row. One shuffle on the
  * key, sort within partitions: the same cost profile as any windowed
  * scan of the table, at any scale; skew is the key's natural skew.
  */
object AsOf {

  /** @param rightVals (rightColumn, outputName) pairs carried onto
    *                  matched left rows (null when no right row ≤ t).
    * @param tieBreakR orders right rows sharing (key, time) so the
    *                  carried value is deterministic — pass a unique
    *                  right column (e.g. its id). */
  def joinAsOf(left: DataFrame, right: DataFrame,
               keyL: String, keyR: String,
               timeL: String, timeR: String,
               rightVals: Seq[(String, String)],
               tieBreakR: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tieCol = "__tie"

    val l0 = left
      .withColumn("__key", col(keyL)).withColumn("__time", col(timeL))
      .withColumn("__side", lit(1))
      .withColumn(tieCol, lit(null).cast("long"))
    val lPadded = rightVals.foldLeft(l0) { case (df, (rc, out)) =>
      df.withColumn(out, lit(null).cast(right.schema(rc).dataType))
    }

    val r0 = right.select(
      Seq(col(keyR).as("__key"), col(timeR).as("__time")) ++
        rightVals.map { case (rc, out) => col(rc).as(out) } :+
        tieBreakR.map(col(_).cast("long")).getOrElse(lit(0L)).as(tieCol): _*)
      .withColumn("__side", lit(0))
    val rPadded = leftCols.foldLeft(r0) { case (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(lPadded.unionByName(rPadded)) {
      case (df, (_, out)) =>
        df.withColumn(s"__asof_$out", last(col(out), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map { case (_, out) => col(s"__asof_$out").as(out) }: _*)
  }
}
