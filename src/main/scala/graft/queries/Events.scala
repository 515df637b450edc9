package graft.queries

import graft.{GateQuery, Tables}
import graft.operators.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics in batch form with DuckDB oracles
  * (SURVEY.md §2.E). The genuinely-streaming variants (watermarks,
  * flatMapGroupsWithState) are exercised in StreamingSpec — their
  * results must equal these batch plans, which is the point.
  *
  * events.ts is nanosecond-precision in parquet; Spark truncates to
  * micros on read, so every oracle works at micro-or-coarser
  * granularity (epoch_us / date_trunc hour).
  */
object Events {

  private val D = DecimalType(12, 2)

  /** E1 — tumbling 1-hour window aggregate. */
  val qTumblingWindow: GateQuery = GateQuery(
    "q_tumbling_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS win,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast("double").as("total_value"))
      .orderBy("win", "event_type")
  }

  /** E2 — 30-minute-gap sessionization, per-user session counts. */
  val qSessionize: GateQuery = GateQuery(
    "q_sessionize",
    """WITH g AS (
      |  SELECT user_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS is_new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(SUM(is_new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM g GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    Sessionize.userSessions(Tables(s, dir, "events"), "user_id", "ts", 1800L)
      .orderBy("user_id")
  }

  /** C16/JSON — extract a typed field from the JSON props column. */
  val qJsonExtract: GateQuery = GateQuery(
    "q_json_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** E2b — top user by event count per event_type (join of window
    * results back to a dimension-like aggregate; exercises rank).
    */
  val qEventLeaders: GateQuery = GateQuery(
    "q_event_leaders",
    """SELECT event_type, user_id, n FROM (
      |  SELECT event_type, user_id, COUNT(*) AS n,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC, user_id) AS rk
      |  FROM events GROUP BY event_type, user_id) t
      |WHERE rk = 1
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val counts = Tables(s, dir, "events")
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy(col("n").desc, col("user_id"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("event_type", "user_id", "n")
      .orderBy("event_type")
  }

  /** E2 session-level table: ids, bounds and sizes per session. */
  val qSessionTable: GateQuery = GateQuery(
    "q_session_table",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
    Sessionize.sessions(Tables(s, dir, "events"), "user_id", "ts", 1800L)
      .orderBy("user_id", "session_id")
  }

  /** E2c — Spark's NATIVE session_window operator (the same operator
    * drives streaming session aggregation) against the lag/cumsum CTE
    * oracle. Boundary semantics probed, not assumed: an event exactly
    * `gap` after its predecessor MERGES into the session (windows
    * [t, t+gap) touching is enough — verified on 4.1.2 with a
    * 0/1800s/3601s fixture), so a new session starts only when the
    * gap is STRICTLY exceeded and the oracle's boundary is `>` —
    * the same convention as the custom E2 sessionizer.
    */
  val qSessionWindow: GateQuery = GateQuery(
    "q_session_window",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS last_us,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, start_us""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_us", "last_us", "n_events")
      .orderBy("user_id", "start_us")
  }

  /** E11 — cohort retention: users bucketed by first-seen week, then
    * distinct active weeks per user → (cohort, week_offset, n_active)
    * matrix. Two key-shuffles (user agg, cohort agg), no self-join
    * explosion; both engines truncate weeks to Monday so offsets are
    * exact multiples of 7 days.
    */
  val qRetention: GateQuery = GateQuery(
    "q_retention",
    """WITH u AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS w
      |  FROM events e),
      |j AS (
      |  SELECT u.cohort_week, CAST(date_diff('week', u.cohort_week, a.w) AS BIGINT) AS week_n
      |  FROM u JOIN a ON a.user_id = u.user_id)
      |SELECT CAST(cohort_week AS DATE) AS cohort_week, week_n, COUNT(*) AS n_active
      |FROM j GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val cohorts = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = ev.select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
    cohorts.join(active, "user_id")
      .select(col("cohort_week"),
        expr("datediff(w, cohort_week) div 7").cast("long").as("week_n"))
      .groupBy(col("cohort_week").cast("date").as("cohort_week"), col("week_n"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_n")
  }

  /** E5 — as-of join: each click matched to the user's latest error at
    * or before it. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  val qAsOfJoin: GateQuery = GateQuery(
    "q_asof_join",
    """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
      |  r.value AS asof_value, epoch_us(r.ts) AS asof_ts_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      |  ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin) { (s, dir) =>
    import graft.operators.AsOf
    val ev = Tables(s, dir, "events")
    AsOf.asOfJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "error").select("user_id", "ts", "value"),
      "user_id", "ts",
      leftCols = Seq("event_id"), rightCols = Seq("value", "ts"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("asof_value"), unix_micros(col("asof_ts")).as("asof_ts_us"))
      .orderBy("event_id")
  }

  /** E5b — FORWARD as-of join: each click paired with the same
    * user's EARLIEST error at or after it ("what broke next") —
    * the time-reversed twin of E5, against DuckDB's native ASOF
    * with the <= condition.
    */
  val qAsOfForward: GateQuery = GateQuery(
    "q_asof_forward",
    """SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
      |  r.value AS asof_value, epoch_us(r.ts) AS asof_ts_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      |  ON l.user_id = r.user_id AND l.ts <= r.ts
      |ORDER BY l.event_id""".stripMargin) { (s, dir) =>
    import graft.operators.AsOf
    val ev = Tables(s, dir, "events")
    AsOf.asOfJoinForward(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "error").select("user_id", "ts", "value"),
      "user_id", "ts",
      leftCols = Seq("event_id"), rightCols = Seq("value", "ts"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("asof_value"), unix_micros(col("asof_ts")).as("asof_ts_us"))
      .orderBy("event_id")
  }

  /** E6 — range join: error events matched into each user's session
    * intervals via bucketed equi-join; oracle is the plain BETWEEN
    * join over the same session CTE.
    */
  val qRangeJoin: GateQuery = GateQuery(
    "q_range_join",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM g),
      |sess AS (
      |  SELECT user_id, session_id,
      |    MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
      |  FROM s GROUP BY user_id, session_id)
      |SELECT sess.user_id, sess.session_id, COUNT(e.event_id) AS n_errors
      |FROM sess
      |JOIN (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
      |      WHERE event_type = 'error') e
      |  ON e.user_id = sess.user_id
      | AND e.ts_us BETWEEN sess.start_us AND sess.end_us
      |GROUP BY sess.user_id, sess.session_id
      |ORDER BY sess.user_id, sess.session_id""".stripMargin) { (s, dir) =>
    import graft.operators.RangeJoin
    val ev = Tables(s, dir, "events")
    val sessions = Sessionize.sessions(ev, "user_id", "ts", 1800L)
      .select("user_id", "session_id", "start_us", "end_us")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    RangeJoin.bucketedRangeJoin(errors, sessions, "user_id",
        "ts_us", "start_us", "end_us", bucketUs = 3600L * 1000000L)
      .groupBy("user_id", "session_id")
      .agg(count(col("event_id")).as("n_errors"))
      .orderBy("user_id", "session_id")
  }

  /** E10 — funnel analysis: per user, first view → first click after
    * it → first purchase after that; counts at each stage plus median
    * view→purchase latency for converters. One shuffle on user_id,
    * conditional min-aggregates — no self-joins, scale-flat.
    */
  val qFunnel: GateQuery = GateQuery(
    "q_funnel",
    """WITH f AS (
      |  SELECT user_id, MIN(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS t_view
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, f.t_view,
      |    MIN(epoch_us(e.ts)) FILTER (WHERE e.event_type = 'click'
      |      AND epoch_us(e.ts) >= f.t_view) AS t_click
      |  FROM events e JOIN f ON f.user_id = e.user_id
      |  GROUP BY e.user_id, f.t_view),
      |p AS (
      |  SELECT e.user_id, c.t_view, c.t_click,
      |    MIN(epoch_us(e.ts)) FILTER (WHERE e.event_type = 'purchase'
      |      AND epoch_us(e.ts) >= c.t_click) AS t_purchase
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  GROUP BY e.user_id, c.t_view, c.t_click)
      |SELECT COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS n_viewed,
      |  COUNT(*) FILTER (WHERE t_click IS NOT NULL) AS n_clicked,
      |  COUNT(*) FILTER (WHERE t_purchase IS NOT NULL) AS n_purchased,
      |  CAST(MEDIAN(t_purchase - t_view) AS DOUBLE) AS median_latency_us
      |FROM p""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val funnel = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("t"))).as("t_view"))
      .join(ev, Seq("user_id"))
      .groupBy("user_id", "t_view")
      .agg(min(when(col("event_type") === "click" && col("t") >= col("t_view"),
        col("t"))).as("t_click"))
      .join(ev, Seq("user_id"))
      .groupBy("user_id", "t_view", "t_click")
      .agg(min(when(col("event_type") === "purchase" && col("t") >= col("t_click"),
        col("t"))).as("t_purchase"))
    funnel.agg(
      count(when(col("t_view").isNotNull, 1)).as("n_viewed"),
      count(when(col("t_click").isNotNull, 1)).as("n_clicked"),
      count(when(col("t_purchase").isNotNull, 1)).as("n_purchased"),
      expr("percentile(t_purchase - t_view, 0.5)").cast("double").as("median_latency_us"))
  }

  val all: Seq[GateQuery] = Seq(
    qTumblingWindow, qSessionize, qSessionTable, qSessionWindow, qJsonExtract,
    qEventLeaders, qAsOfJoin, qAsOfForward, qRangeJoin, qFunnel, qRetention)
}
