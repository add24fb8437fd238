package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band/range join on time: pairs of (left, right) rows with the same
  * key whose times are within `[0, maxDelta]` of each other
  * (right.time - left.time ∈ [0, maxDelta] — "right happens within Δ
  * after left").
  *
  * Spark-first shape: a naive `l.join(r, key && lo <= t && t <= hi)`
  * plans as a cross-ish join with per-key quadratic candidates. Here
  * both sides bucket time into Δ-sized cells; a right row within Δ
  * after a left row is either in the left row's cell or the next one,
  * so each left row joins exactly TWO (key, cell) buckets. Candidate
  * count is bounded by bucket occupancy, the final inequality filter
  * is exact, and the join is a plain equi-join Catalyst can shuffle or
  * broadcast like any other. (The same trick DuckDB's IEJoin and
  * Spark's range-join hints implement natively.)
  */
object RangeJoin {

  /** Exact Δ-cell of a (possibly nano-scale) long time column: decimal
    * division, not double — at epoch-nanos magnitudes a long→double
    * cast loses low bits and can flip the floor at cell boundaries. */
  private def cell(t: Column, delta: Long): Column =
    floor(t.cast("decimal(38,0)") / delta).cast("long")

  def joinWithin(left: DataFrame, right: DataFrame,
                 keyL: String, keyR: String,
                 timeL: String, timeR: String,
                 maxDelta: Long): DataFrame = {
    require(maxDelta >= 1, "maxDelta must be >= 1")
    val l = left
      .withColumn("__cell",
        explode(array(cell(col(timeL), maxDelta), cell(col(timeL), maxDelta) + 1)))
      .withColumn("__k", col(keyL))
    val r = right
      .withColumn("__cell", cell(col(timeR), maxDelta))
      .withColumn("__k", col(keyR))
      .drop(keyR) // avoid duplicate key column in the joined frame
    // each qualifying pair matches exactly one of the left row's two
    // cells (the right row has a single cell), so no dedup is needed
    l.join(r, Seq("__k", "__cell"))
      .filter(col(timeR) >= col(timeL) &&
        col(timeR) - col(timeL) <= maxDelta)
      .drop("__k", "__cell")
  }
}
