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

  /** Nearest-event join (kdb `aj`'s two-sided cousin): for each left row,
    * the right row in the same key minimizing `|right.ts − left.ts|`,
    * looking BOTH directions — the sensor-alignment / nearest-quote shape
    * [[asofJoin]]'s at-or-before semantics can't express when the closest
    * reading may be slightly in the future. Ties (equidistant before and
    * after) resolve to the EARLIER right row; a right row at exactly the
    * left timestamp wins outright (distance 0). Output: all `left`
    * columns, right values prefixed `nearest_`, plus `nearest_gap_us`
    * (microseconds, null when the key has no right rows at all).
    *
    * Same cost class as [[asofJoin]] — the tagged union sorts ONCE per
    * key and BOTH directional carries (`last` over preceding, `first`
    * over following) run as two frames on that single sorted exchange;
    * Catalyst reuses the sort because the windows share partitioning and
    * ordering. No range self-join, no per-key arrays, so at 100 TB it is
    * one user-keyed shuffle exactly like any windowed aggregation. */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts"): DataFrame = {
    val rightVals = right.columns.filterNot(c => keyCols.contains(c))
    val leftVals = left.columns.filterNot(keyCols.contains)
    val rFields = right.schema(rightTs).copy(name = "_rts") +:
      rightVals.map(c => right.schema(c).copy(name = c))
    val rStructType = org.apache.spark.sql.types.StructType(rFields)
    // tag 0 = right (sorts first at equal ts → distance-0 match lands in
    // the BEFORE carry), 1 = left
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_tag"),
          struct(col(rightTs).as("_rts") +: rightVals.map(col): _*)
            .as("_rvals")) ++
        leftVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_tag"),
          lit(null).cast(rStructType).as("_rvals")) ++
        leftVals.map(col): _*)
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_tag"))
    val wBefore = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wAfter = ord.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("_before", last(col("_rvals"), ignoreNulls = true)
        .over(wBefore))
      .withColumn("_after", first(col("_rvals"), ignoreNulls = true)
        .over(wAfter))
    val lts = unix_micros(col("_ts").cast("timestamp"))
    def rts(c: Column) = unix_micros(c.getField("_rts").cast("timestamp"))
    val gapB = lts - rts(col("_before"))
    val gapA = rts(col("_after")) - lts
    val pick = when(col("_before").isNull, col("_after"))
      .when(col("_after").isNull, col("_before"))
      // tie → the earlier right row (the before side)
      .when(gapB <= gapA, col("_before"))
      .otherwise(col("_after"))
    carried.filter(col("_tag") === 1)
      .withColumn("_pick", pick)
      .select(keyCols.map(col) ++ leftVals.map(col) ++
        rightVals.map(c => col("_pick").getField(c).as(s"nearest_$c")) :+
        when(col("_pick").isNotNull,
          abs(rts(col("_pick")) - lts)).as("nearest_gap_us"): _*)
  }
}
