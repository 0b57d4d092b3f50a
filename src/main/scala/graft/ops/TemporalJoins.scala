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
    // _rvals as the final sort key totally orders same-key same-ts right
    // rows (left rows all carry null there, and their relative order
    // never changes an IGNORE NULLS carry), so the picked match is
    // deterministic across runs and partition layouts: ties at equal ts
    // resolve to the LARGEST right struct (field-lexicographic).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_tag"), col("_rvals"))
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
    // Same determinism discipline as [[asofJoin]] (and the (ts, tag, eid)
    // ordering in attributionPositional): _rvals as the final sort key
    // totally orders same-key same-ts right rows, so when a key has two
    // right rows at one timestamp the before carry picks the LARGEST
    // right struct and the after carry the SMALLEST — fixed across runs,
    // partition layouts, and the bit-for-bit replay contract.
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_tag"), col("_rvals"))
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

  /** Batch sessionization to INTERVALS (gaps-and-islands): per key, rows
    * ordered by `tsCol` split into sessions wherever the gap to the
    * previous row exceeds `gapUs` microseconds; one output row per session
    * with `(session_ix, start_ts, end_ts, n_events)`, sessions numbered
    * from 1 in time order within the key. Deterministic under timestamp
    * ties: equal timestamps have gap 0 ≤ gapUs, so they land in the same
    * session regardless of their relative sort order, and min/max/count
    * are order-free.
    *
    * ONE key-partitioned shuffle: the lag + running-sum windows and the
    * (key, session) aggregation all share the key partitioning — the
    * windowed-aggregation cost class at any scale, no per-key arrays. */
  def sessionIntervals(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_us"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(keyCols.map(col) :+
        unix_micros(col(tsCol).cast("timestamp")).as("_us"): _*)
      .withColumn("_new",
        when(col("_us") - lag(col("_us"), 1).over(ord) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_ix", sum(col("_new")).over(run) + 1L)
      .groupBy(keyCols.map(col) :+ col("session_ix"): _*)
      .agg(min(col("_us")).as("start_us"), max(col("_us")).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Interval-overlap join via temporal BUCKETING — pairs of (left, right)
    * rows in the same key whose CLOSED microsecond intervals
    * `[start, end]` overlap (`l.start ≤ r.end AND r.start ≤ l.end`). The
    * naive formulation is an equi-key theta-join — per-key cross product,
    * quadratic on skewed keys. Here each interval instead replicates to
    * the fixed-width time buckets it touches (`floor(start/bucketUs)` ..
    * `floor(end/bucketUs)`), the join runs as a plain EQUI-join on
    * (key, bucket), and each surviving pair is emitted EXACTLY ONCE — by
    * the bucket containing `max(l.start, r.start)`, so no distinct pass
    * re-shuffles the output. Replication factor per row is
    * `len/bucketUs + 1`: pick `bucketUs` at or above the typical interval
    * length and the join stays linear with a small constant at any scale,
    * while long skewed intervals split across buckets instead of
    * concentrating on one join key.
    *
    * Both sides must carry `keyCols` plus BIGINT-microsecond
    * `startCol`/`endCol`; non-key value columns must not collide (alias
    * before the call — the output keeps both sides' columns as-is). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      startCol: String = "start_us", endCol: String = "end_us",
      bucketUs: Long = 3600L * 1000000): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val collide = left.columns.toSet.intersect(right.columns.toSet)
      .diff(keyCols.toSet + startCol + endCol)
    require(collide.isEmpty, s"value columns collide: $collide")
    def buckets(df: DataFrame, side: String): DataFrame = {
      val vals = df.columns.filterNot(keyCols.contains).map { c =>
        if (c == startCol || c == endCol) col(c).as(s"_$side$c")
        else col(c)
      }
      df.select(keyCols.map(col) ++ vals: _*)
        .withColumn("_bk", explode(sequence(
          floor(col(s"_$side$startCol") / bucketUs),
          floor(col(s"_$side$endCol") / bucketUs))))
    }
    val l = buckets(left, "l")
    val r = buckets(right, "r")
    val ls = col(s"_l$startCol"); val le = col(s"_l$endCol")
    val rs = col(s"_r$startCol"); val re = col(s"_r$endCol")
    l.join(r, keyCols :+ "_bk")
      .filter(ls <= re && rs <= le &&
        col("_bk") === floor(greatest(ls, rs) / bucketUs))
      .drop("_bk")
      .withColumnRenamed(s"_l$startCol", s"l_$startCol")
      .withColumnRenamed(s"_l$endCol", s"l_$endCol")
      .withColumnRenamed(s"_r$startCol", s"r_$startCol")
      .withColumnRenamed(s"_r$endCol", s"r_$endCol")
  }
}
