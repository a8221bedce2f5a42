package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.F — event-stream analytics, verified through batch twins (identical
  * semantics, DuckDB-checkable); graft.streaming.Sessionizer holds the
  * Structured Streaming versions (watermark + flatMapGroupsWithState),
  * exercised by StreamingSpec against these batch results.
  */
object StreamingQueries {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(28,4)")).cast("double")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q60_event_window_agg",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("event_type"), col("n_events"), col("sum_value")),
      Some("""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
             |       event_type, COUNT(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2""".stripMargin)
    ),
    QueryDef(
      // 30-minute-gap sessions (batch twin of Sessionizer.sessionize):
      // lag → gap flag → running sum = session index → group.
      "q61_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val events = Tables.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
          .withColumn("sess_idx",
            sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        events
          .groupBy("user_id", "sess_idx")
          .agg(
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
            count(lit(1)).as("n_events"),
            dsum(col("value")).as("sum_value"))
          .select("user_id", "sess_idx", "session_start", "session_end", "n_events", "sum_value")
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |         CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
             |                OR epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
             |              THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sessions AS (
             |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_idx
             |  FROM flagged)
             |SELECT user_id, sess_idx,
             |       strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_start,
             |       strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS session_end,
             |       COUNT(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
             |FROM sessions
             |GROUP BY user_id, sess_idx""".stripMargin)
    ),
    QueryDef(
      // Backward as-of join (TemporalOps.asofJoin): each click event picks
      // the most recent view event at-or-before it per user. The merge-
      // style plan is one shuffle on user_id + one window pass — no range
      // join, no per-left-row scan of the right side. Oracle: DuckDB's
      // native ASOF LEFT JOIN (inclusive >= semantics match the tag order).
      "q62_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        val views = ev.filter(col("event_type") === "view")
          .select("user_id", "ts", "value")
        graft.operators.TemporalOps.asofJoin(
            clicks, views, Seq("user_id"), "ts", Seq("value"))
          .select(
            col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"),
            unix_micros(col("asof_ts")).as("asof_us"),
            col("asof_value"))
      },
      Some("""WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
             |           FROM events WHERE event_type = 'click'),
             |     r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
             |           FROM events WHERE event_type = 'view')
             |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
             |       epoch_us(r.ts) AS asof_us, r.value AS asof_value
             |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin)
    ),
    QueryDef(
      // Interval join, grid-bucketed: attribute events to the top-20
      // busiest-hour "campaign windows" (hour ± [−30, +90) min). The
      // windows frame is O(20), but the JOIN SHAPE is the scalable one —
      // each window explodes to its covered hour cells, events equi-join
      // on their own hour cell (broadcast hash join), and the exact
      // [w_start, w_end) containment filters after. No BNLJ/cartesian even
      // if the interval side grew to millions; a 2-hour window covers at
      // most 3 cells so the fanout is constant. The oracle uses DuckDB's
      // direct range join — identical result set because the cell cover
      // is exhaustive. Windows may overlap: an event near an hour edge
      // attributes to both neighbors, which is interval-join semantics
      // (not a partitioning).
      "q63_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val wins = ev
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("h").asc).limit(20)
          .select(col("h"),
            (col("h") - expr("INTERVAL 30 MINUTES")).as("w_start"),
            (col("h") + expr("INTERVAL 90 MINUTES")).as("w_end"))
        val cells = wins.select(col("h"), col("w_start"), col("w_end"),
          explode(sequence(date_trunc("hour", col("w_start")),
            date_trunc("hour", col("w_end")), expr("INTERVAL 1 HOUR"))).as("cell"))
        ev.withColumn("cell", date_trunc("hour", col("ts")))
          .join(broadcast(cells), Seq("cell"))
          .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
          .groupBy("h")
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("window_hour"),
            col("n_events"), col("sum_value"))
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, COUNT(*) AS n
             |  FROM events GROUP BY 1),
             |wins AS (
             |  SELECT h, h - INTERVAL 30 MINUTE AS w_start, h + INTERVAL 90 MINUTE AS w_end
             |  FROM hourly ORDER BY n DESC, h LIMIT 20)
             |SELECT strftime(w.h, '%Y-%m-%d %H:%M:%S') AS window_hour,
             |       COUNT(*) AS n_events,
             |       CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
             |FROM events e JOIN wins w
             |  ON CAST(e.ts AS TIMESTAMP) >= w.w_start AND CAST(e.ts AS TIMESTAMP) < w.w_end
             |GROUP BY w.h""".stripMargin)
    ),
    QueryDef(
      // Retry collapse: keep ONE event per (user, type, minute) — the
      // batch twin of Sessionizer.dedupSameMinute (streaming dropDuplicates
      // with watermark-bounded state). "First" is event-time first with an
      // event_id tiebreak, so the kept set is deterministic; the streaming
      // twin keeps arrival-first, which StreamingSpec aligns by feeding in
      // event-time order. One shuffle on the dedup key.
      "q64_dedup_minute",
      (s, d) => {
        val w = Window
          .partitionBy("user_id", "event_type", "minute_start")
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .withColumn("minute_start", date_trunc("minute", col("ts")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("event_id"), col("user_id"), col("event_type"),
            date_format(col("minute_start"), "yyyy-MM-dd HH:mm:ss").as("minute_start"))
      },
      Some("""SELECT event_id, user_id, event_type,
             |       strftime(minute_start, '%Y-%m-%d %H:%M:%S') AS minute_start
             |FROM (
             |  SELECT event_id, user_id, event_type,
             |         date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_start,
             |         row_number() OVER (
             |           PARTITION BY user_id, event_type, date_trunc('minute', CAST(ts AS TIMESTAMP))
             |           ORDER BY ts, event_id) AS rn
             |  FROM events) t
             |WHERE rn = 1""".stripMargin)
    ),
    QueryDef(
      // Sketch-based summary stats: HyperLogLog++ distinct users and
      // t-digest median value per event type — THE summary path at
      // 100 TB, where exact distinct/percentile would shuffle every
      // value. Both sketches are merge-associative (map-side partials,
      // O(sketch) per partition) and deterministic (hash-based, no RNG),
      // but their estimates are engine-specific, so this declares no SQL
      // oracle; the golden spec bounds the estimates against exact
      // answers (HLL++ rsd 5%, t-digest vs exact median).
      "q69_sketch_stats",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            approx_count_distinct(col("user_id"), 0.05).as("approx_users"),
            expr("approx_percentile(value, 0.5, 1000)").as("approx_median")),
      None
    ),
    QueryDef(
      // Semi-structured extraction: the events props column is a JSON
      // string; pull a typed field out (get_json_object stays inside
      // codegen — no UDF, no Jackson per-row object churn beyond the
      // shared parser) and aggregate on it. The JSON parse is map-side;
      // the only shuffle is the final bounded-key aggregation.
      "q79_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
            col("value"))
          .groupBy("event_type", "prop_k")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")),
      Some("""SELECT event_type,
             |       CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2""".stripMargin)
    ),
    QueryDef(
      // Stream-static enrichment (batch twin of Sessionizer.enrich, the
      // broadcast-dimension join StreamingSpec drives through a
      // MemoryStream): every event picks up its user's market segment
      // from the customer dim, then aggregates per (segment, type). In a
      // stream the dim side must be bounded and broadcast — the stateless
      // per-batch join shape that needs no watermark; at 100 TB/day of
      // events the dim broadcast is what keeps enrichment shuffle-free.
      "q96_stream_enrich",
      (s, d) =>
        Tables.events(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey").as("user_id"), col("c_mktsegment"))),
            Seq("user_id"))
          .groupBy("c_mktsegment", "event_type")
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value")),
      Some("""SELECT c.c_mktsegment, e.event_type,
             |       COUNT(*) AS n_events,
             |       CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1, 2""".stripMargin)
    ),
    QueryDef(
      // Click→view attribution pairs: every view by the same user in the
      // hour before each click (batch twin of Sessionizer.attributeClicks,
      // the watermarked stream-stream interval join StreamingSpec drives
      // through a MemoryStream self-join). Batch shape: one shuffle on
      // user_id + a range filter — per-user event rates are bounded, so
      // the equi-join never fans out quadratically in the table size; the
      // streaming twin bounds its join STATE by the same interval.
      "q103_click_attribution",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
        clicks.join(views, Seq("user_id"))
          .filter(col("view_ts") <= col("click_ts") &&
            col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
          .select(col("click_id"), col("user_id"),
            unix_micros(col("click_ts")).as("click_us"),
            col("view_id"), unix_micros(col("view_ts")).as("view_us"))
      },
      Some("""WITH c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS cts
             |           FROM events WHERE event_type = 'click'),
             |     v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vts
             |           FROM events WHERE event_type = 'view')
             |SELECT c.click_id, c.user_id, epoch_us(c.cts) AS click_us,
             |       v.view_id, epoch_us(v.vts) AS view_us
             |FROM c JOIN v ON c.user_id = v.user_id
             | AND v.vts <= c.cts AND v.vts >= c.cts - INTERVAL 1 HOUR""".stripMargin)
    ),
    QueryDef(
      // Late-data reconciliation: the nightly base aggregate merges with a
      // late-arrival delta by SUMMING the mergeable partials (count, sum)
      // per group — the backfill algebra that lets a 100 TB pipeline
      // reprocess only affected partitions instead of recomputing the
      // world. The oracle is the full recompute over all events, so the
      // hash check IS the proof that merge(base, delta) == recompute.
      // Late rows are a deterministic slice (event_id % 20) so both
      // engines split identically.
      "q116_late_data_merge",
      (s, d) => {
        val ev = Tables.events(s, d)
        def agg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(28,4)")).as("sv"))
        val base = agg(ev.filter(pmod(col("event_id"), lit(20)) =!= 0))
        val late = agg(ev.filter(pmod(col("event_id"), lit(20)) === 0))
        base.withColumnRenamed("n_events", "n_b").withColumnRenamed("sv", "sv_b")
          .join(late.withColumnRenamed("n_events", "n_l").withColumnRenamed("sv", "sv_l"),
            Seq("hour_start", "event_type"), "full_outer")
          .select(col("hour_start"), col("event_type"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_l"), lit(0L))).as("n_events"),
            // A group whose every value is NULL must merge to NULL (SUM
            // semantics), not 0 — coalesce only fills a side that is absent
            // from the outer join, never both sides at once.
            when(col("sv_b").isNull && col("sv_l").isNull, lit(null).cast("double"))
              .otherwise((coalesce(col("sv_b"), lit(0).cast("decimal(28,4)")) +
                coalesce(col("sv_l"), lit(0).cast("decimal(28,4)")))
                .cast("double")).as("sum_value"))
      },
      Some("""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
             |       event_type, COUNT(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2""".stripMargin)
    ),
    QueryDef(
      // Left-outer attribution (batch twin of attributeClicks with
      // joinType = leftOuter): q103 plus one NULL-view row per unattributed
      // click. In the stream the outer rows emit only once the watermark
      // closes each click's window — the delayed-emission semantics the
      // StreamingSpec sentinel test pins; in batch it's a plain left join.
      "q111_attribution_outer",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
            col("ts").as("view_ts"))
        clicks.join(views,
            col("user_id") === col("v_user") &&
              col("view_ts") <= col("click_ts") &&
              col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"),
            "left")
          .select(col("click_id"), col("user_id"),
            unix_micros(col("click_ts")).as("click_us"),
            col("view_id"), unix_micros(col("view_ts")).as("view_us"))
      },
      Some("""WITH c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS cts
             |           FROM events WHERE event_type = 'click'),
             |     v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vts
             |           FROM events WHERE event_type = 'view')
             |SELECT c.click_id, c.user_id, epoch_us(c.cts) AS click_us,
             |       v.view_id, epoch_us(v.vts) AS view_us
             |FROM c LEFT JOIN v ON c.user_id = v.user_id
             | AND v.vts <= c.cts AND v.vts >= c.cts - INTERVAL 1 HOUR""".stripMargin)
    ),
    QueryDef(
      // Ordered conversion funnel: the furthest view -> click -> purchase
      // stage each user reaches, each step strictly AFTER the previous
      // step's first completion (not mere presence of all three types).
      // Three per-user min-aggregates chained by equi-join + range filter
      // on user_id — no windows over the event table, no self-cross;
      // shuffles scale with the user keyspace. Event timestamps carry no
      // sub-microsecond parts and no per-user duplicates in the testdata,
      // so strict > is engine-safe.
      "q97_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = ev.filter(col("event_type") === "click").join(v, Seq("user_id"))
          .filter(col("ts") > col("t1")).groupBy("user_id").agg(min("ts").as("t2"))
        val p = ev.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
          .filter(col("ts") > col("t2")).groupBy("user_id").agg(min("ts").as("t3"))
        ev.select("user_id").distinct()
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t3").isNotNull, 3)
              .when(col("t2").isNotNull, 2)
              .when(col("t1").isNotNull, 1)
              .otherwise(0).as("funnel_stage"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
             |  FROM events WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |   AND CAST(e.ts AS TIMESTAMP) > v.t1
             |  WHERE e.event_type = 'click' GROUP BY 1),
             |p AS (
             |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |   AND CAST(e.ts AS TIMESTAMP) > c.t2
             |  WHERE e.event_type = 'purchase' GROUP BY 1)
             |SELECT u.user_id,
             |       CASE WHEN p.t3 IS NOT NULL THEN 3
             |            WHEN c.t2 IS NOT NULL THEN 2
             |            WHEN v.t1 IS NOT NULL THEN 1
             |            ELSE 0 END AS funnel_stage
             |FROM (SELECT DISTINCT user_id FROM events) u
             |LEFT JOIN v ON u.user_id = v.user_id
             |LEFT JOIN c ON u.user_id = c.user_id
             |LEFT JOIN p ON u.user_id = p.user_id""".stripMargin)
    )
  )
}
