package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every left row, the most recent
  * right row with the same key at or before the left row's time —
  * or, with `direction = "forward"`, the earliest right row at or
  * after it (CH ASOF JOIN's `>=`/`<=` pair; pandas merge_asof's
  * direction). An optional `tolerance` (in the time column's units)
  * voids matches farther than the bound, as in pandas.
  *
  * Spark-first shape: NOT a range join (whose candidate set explodes
  * with per-key row counts) — a tagged union + one keyed sort window.
  * For backward joins right rows sort before left rows at equal
  * timestamps (≤ semantics) and `last(..., ignoreNulls)` over the
  * running frame carries each right value forward; forward joins flip
  * the side order and use `first` over the following frame. One
  * shuffle on the key, sort within partitions: the same cost profile
  * as any windowed scan of the table, at any scale; skew is the key's
  * natural skew. Tolerance is a post-projection on the carried match
  * time — no extra pass.
  */
object AsOf {

  /** @param rightVals (rightColumn, outputName) pairs carried onto
    *                  matched left rows (null when no right row
    *                  matches, or the match is out of tolerance).
    * @param tieBreakR orders right rows sharing (key, time) so the
    *                  carried value is deterministic — pass a unique
    *                  right column (e.g. its id).
    * @param direction "backward" (right.t ≤ left.t, the default) or
    *                  "forward" (right.t ≥ left.t).
    * @param tolerance max |left.t − right.t| for a match to count, in
    *                  the time column's own units. */
  def joinAsOf(left: DataFrame, right: DataFrame,
               keyL: String, keyR: String,
               timeL: String, timeR: String,
               rightVals: Seq[(String, String)],
               tieBreakR: Option[String] = None,
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"unknown direction '$direction'")
    val backward = direction == "backward"
    val leftCols = left.columns.toSeq
    val tieCol = "__tie"
    val rtCol = "__rtime"
    // right rows sort BEFORE left at equal times for ≤ semantics,
    // AFTER them for ≥ — equal-time rights match in both directions
    val (rightSide, leftSide) = if (backward) (0, 1) else (1, 0)
    val valsAll = rightVals :+ (timeR -> rtCol)

    val l0 = left
      .withColumn("__key", col(keyL)).withColumn("__time", col(timeL))
      .withColumn("__side", lit(leftSide))
      .withColumn(tieCol, lit(null).cast("long"))
    val lPadded = valsAll.foldLeft(l0) { case (df, (rc, out)) =>
      df.withColumn(out, lit(null).cast(right.schema(rc).dataType))
    }

    val r0 = right.select(
      Seq(col(keyR).as("__key"), col(timeR).as("__time")) ++
        valsAll.map { case (rc, out) => col(rc).as(out) } :+
        tieBreakR.map(col(_).cast("long")).getOrElse(lit(0L)).as(tieCol): _*)
      .withColumn("__side", lit(rightSide))
    val rPadded = leftCols.foldLeft(r0) { case (df, c) =>
      if (valsAll.exists(_._2 == c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val ord = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__side"), col(tieCol))
    val w =
      if (backward) ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def carry(c: Column): Column =
      if (backward) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)
    val carried = valsAll.foldLeft(lPadded.unionByName(rPadded)) {
      case (df, (_, out)) => df.withColumn(s"__asof_$out", carry(col(out)))
    }
    val inTol: Column = tolerance match {
      case None => lit(true)
      case Some(t) =>
        val gap =
          if (backward) col("__time") - col(s"__asof_$rtCol")
          else col(s"__asof_$rtCol") - col("__time")
        gap <= t
    }
    carried.filter(col("__side") === leftSide)
      .select(leftCols.map(col) ++
        rightVals.map { case (_, out) =>
          when(inTol, col(s"__asof_$out")).otherwise(lit(null)).as(out)
        }: _*)
  }
}
