package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as primitives, composed from
  * built-in ops (the preference order SURVEY §7.3 / the builder mandate
  * prescribe: compose before custom plans).
  *
  *   - [[asofJoin]]: for each left row, the latest right row with
  *     `right.ts <= left.ts` within the same key — implemented as the
  *     union-and-carry-forward pattern: tag both inputs, sort per key by
  *     (ts, tag), and carry the right side's columns forward with
  *     `last(_, ignoreNulls = true)` over an unbounded-preceding window.
  *     ONE shuffle (by key), no range self-join blowup; at 100 TB this is
  *     a sort within key partitions, the same cost class as any windowed
  *     aggregation. Right rows at ts equal to the left row ARE visible
  *     (`<=` semantics, matching DuckDB/kdb ASOF).
  *   - [[rangeJoinCount]]: equi+range join — Catalyst handles the equi key
  *     as the join key and evaluates the range predicate as a post-join
  *     filter; with the equi key present this stays a hash/sort-merge
  *     join, not a cartesian.
  */
object TemporalJoins {

  /** As-of join. Output: all `left` columns plus `right`'s non-key columns
    * prefixed `asof_` (null when no right row precedes). `keyCols` must
    * exist on both sides; `leftTs`/`rightTs` name the timestamp columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts"): DataFrame = {
    val rightVals = right.columns.filterNot(c => keyCols.contains(c))
    val leftVals = left.columns.filterNot(keyCols.contains)
    // Right values travel as ONE struct so the carried match is row-atomic
    // (per-column carry could stitch together different right rows when
    // some of their columns are null).
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    // tag 0 = right (sorts first at equal ts → visible to left), 1 = left
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_tag"),
          struct(rightVals.map(col): _*).as("_rvals")) ++
        leftVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_tag"),
          lit(null).cast(rStructType).as("_rvals")) ++
        leftVals.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("_rvals", last(col("_rvals"), ignoreNulls = true).over(w))
    carried.filter(col("_tag") === 1)
      .select(keyCols.map(col) ++ leftVals.map(col) ++
        rightVals.map(c => col("_rvals").getField(c).as(s"asof_$c")): _*)
  }

  /** Equi+range join with grouped counts — the common "events within a
    * window of an anchor row" shape. */
  def rangeJoinCount(left: DataFrame, right: DataFrame, equi: Column,
      range: Column, groupBy: Seq[Column], alias: String = "n"): DataFrame =
    left.join(right, equi && range)
      .groupBy(groupBy: _*).agg(count(lit(1)).as(alias))
}
