package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, attach the latest right row
  * whose timestamp is <= the left timestamp, within the same key — the
  * time-series "most recent quote for this trade" shape.
  *
  * Spark-first formulation: no join at all. Both sides are unioned with a
  * side tag, one window pass per key carries the right payload forward in
  * time order, and left rows read the carried value:
  *
  *   sort (key, ts, side)  with right-side rows ordered BEFORE left rows at
  *   equal ts (so an exactly-simultaneous right row is visible, matching
  *   ASOF's ts_left >= ts_right), then
  *   last(payload, ignoreNulls) over rows unbounded preceding..current.
  *
  * Cost: ONE hash shuffle of |L|+|R| rows by key + a per-partition sort —
  * the same price as a single equi-join shuffle, with no per-key row
  * explosion regardless of how many right rows precede a left row. This is
  * the plan that survives 100 TB: state per key is a single carried row.
  *
  * The reference has no as-of join (SURVEY §2.3); DuckDB's native ASOF JOIN
  * serves as the differential oracle. Right-side (key, ts) duplicates make
  * ASOF ambiguous — callers should pre-aggregate the right side to one row
  * per (key, ts), which `join_asof` in PipelineQueries does.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry (must not collide with left). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideL = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val sideLFull = payload.foldLeft(sideL)((d, p) =>
      d.withColumn(p, lit(null).cast(right.schema(p).dataType)))
    val sideR0 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val sideRFull = leftCols.filterNot(c => c == key)
      .foldLeft(sideR0)((d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = sideLFull.select((Seq(key, "__ts", "__side") ++
        leftCols.filterNot(_ == key) ++ payload).map(col): _*)
      .unionByName(sideRFull.select((Seq(key, "__ts", "__side") ++
        leftCols.filterNot(_ == key) ++ payload).map(col): _*))
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((d, p) =>
      d.withColumn(s"__asof_$p", last(col(p), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col(s"__asof_$p").as(p))): _*)
  }
}
