package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream: watermarked
  * tumbling-window aggregation and gap-based sessionization with custom
  * state (flatMapGroupsWithState) — the streaming twins of q60/q61.
  *
  * Scale shape: both are keyed-state operators; state is partitioned by
  * the grouping key across executors, and the watermark bounds state size
  * (old windows/sessions are evicted once event time passes them).
  */
object Sessionizer {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Gap that closes a session (matches the batch twin in q61). */
  val GapMs: Long = 30 * 60 * 1000L

  /** Exactly-once event dedup: drops event_id repeats, with state bounded
    * by the watermark (late duplicates past the watermark age out of state;
    * the upstream source's replay window must fit inside it).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  /** Retry collapse (streaming twin of q64): one event per (user, type,
    * minute), state bounded by the watermark. dropDuplicates keeps the
    * FIRST ARRIVAL per key; that equals the batch twin's event-time-first
    * exactly when the source delivers in event-time order (true for
    * replayed logs; StreamingSpec feeds sorted input to assert equality).
    */
  def dedupSameMinute(events: DataFrame): DataFrame =
    events
      .withColumn("minute_start", date_trunc("minute", col("ts")))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type", "minute_start")

  /** Stream-static enrichment: the static side is broadcast per micro-batch
    * (no stateful shuffle) — the streaming twin of the dimension joins in
    * the batch queries.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Hourly tumbling-window counts with a 1-hour watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"))

  /** Gap-based sessionization with explicit state: sessions emit when the
    * event-time watermark passes start-of-gap (EventTimeTimeout), so state
    * for quiet users is bounded by the watermark, not the stream length.
    */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[Session] = {
    import spark.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // Watermark passed the session gap: emit and clear.
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum))
          } else {
            // Micro-batch arrival order is not event-time order; fold sorted.
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= GapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + GapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-stream attribution join (the streaming twin of q103): each
    * click pairs with every view by the same user in the preceding hour.
    * Both sides are watermarked and the join condition is a bounded
    * event-time interval, so Spark can size the state store exactly: a
    * buffered view is droppable once the watermark passes view_ts + 1 h
    * (no click can still arrive that reaches back to it), and a buffered
    * click once the watermark passes click_ts. Without the interval bound
    * a stream-stream join would buffer both streams forever — THE
    * failure mode at 100 TB/day; with it, state is (per-user rate × 1 h).
    * Inner-join rows emit as soon as both sides arrive (no watermark
    * wait), so results are incremental.
    */
  def attributeClicks(clicks: DataFrame, views: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    // "leftOuter" adds the unmatched-click rows (view columns NULL), which
    // CANNOT emit eagerly: a click stays pending until the watermark
    // proves no in-window view can still arrive, so outer results trail
    // the inner ones by the watermark delay — the semantics StreamingSpec
    // pins with a sentinel flush.
    c.join(v,
        expr("user_id = view_user AND view_ts <= click_ts " +
          "AND view_ts >= click_ts - INTERVAL 1 HOUR"),
        joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  final case class FunnelStage(user_id: Long, funnel_stage: Int)

  /** Event-time micros; Timestamp.getTime is ms-truncated, the batch twin
    * compares at full µs precision.
    */
  private def us(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming twin of q97: the view → click → purchase funnel as a keyed
    * state machine (each step locks in the FIRST qualifying event-time
    * strictly after the previous step), emitting the user's current stage
    * in Update mode. State is three longs per user — bounded by the user
    * keyspace; a production stream would age out idle users with an
    * event-time timeout like [[sessionize]] does. Equals the batch q97
    * result whenever micro-batches arrive in event-time order (replayed
    * logs; StreamingSpec feeds sorted input), because the state machine
    * is then folding the same ordered sequence the batch min-aggregates
    * summarize.
    */
  def funnel(spark: SparkSession, events: DataFrame): Dataset[FunnelStage] = {
    import spark.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelStage](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
          rows.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            val t = us(e.ts)
            e.event_type match {
              case "view" if s.t1 == 0L                            => s = s.copy(t1 = t)
              case "click" if s.t1 != 0L && t > s.t1 && s.t2 == 0L => s = s.copy(t2 = t)
              case "purchase" if s.t2 != 0L && t > s.t2 && s.t3 == 0L => s = s.copy(t3 = t)
              case _ =>
            }
          }
          state.update(s)
          FunnelStage(userId,
            if (s.t3 != 0L) 3 else if (s.t2 != 0L) 2 else if (s.t1 != 0L) 1 else 0)
      }
  }
}
