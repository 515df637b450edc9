package graft.queries

import graft.{GateQuery, Tables}
import graft.operators.Timeseries
import org.apache.spark.sql.functions._

/** Event-log shaping gates (SURVEY.md §2.E18–E20) over the events
  * table: gap-filled hourly series, SCD2 validity intervals, and the
  * Markov transition matrix. Oracles replay the full derivation in
  * DuckDB — the hour grid via a recursive CTE (generate_series only
  * takes constants there), segments and transitions via the same
  * lag/cumsum windows both engines order identically on
  * (epoch micros, event_id).
  */
object Events2 {

  /** E18 — dense hourly series per event_type, zero-filled gaps. */
  val qGapfill: GateQuery = GateQuery(
    "q_gapfill",
    """WITH RECURSIVE h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hh, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT MIN(hh) AS mn, MAX(hh) AS mx FROM h),
      |hours AS (
      |  SELECT mn AS hh, mx FROM b
      |  UNION ALL
      |  SELECT hh + INTERVAL 1 HOUR, mx FROM hours WHERE hh < mx),
      |grid AS (
      |  SELECT t.event_type, hours.hh
      |  FROM (SELECT DISTINCT event_type FROM events) t, hours)
      |SELECT g.event_type, epoch_us(g.hh) AS hour_us, COALESCE(h.n, 0) AS n
      |FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.hh = g.hh
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Timeseries.gapFillHourly(Tables(s, dir, "events"), "event_type", "ts")
      .orderBy("event_type", "hour_us")
  }

  /** E19 — SCD2 intervals: per user, consecutive same-type runs
    * collapse to versioned [valid_from_us, valid_to_us) segments; the
    * open (current) segment carries valid_to_us = -1.
    */
  val qScd2: GateQuery = GateQuery(
    "q_scd2",
    """WITH o AS (
      |  SELECT user_id, event_type AS status, epoch_us(ts) AS t_us, event_id,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |seg AS (
      |  SELECT user_id, status, t_us,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM o),
      |g AS (
      |  SELECT user_id, CAST(grp AS BIGINT) AS version, status,
      |    MIN(t_us) AS valid_from_us, COUNT(*) AS n_events
      |  FROM seg GROUP BY 1, 2, 3)
      |SELECT user_id, version, status, valid_from_us,
      |  COALESCE(lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version),
      |           -1) AS valid_to_us,
      |  n_events
      |FROM g
      |ORDER BY user_id, version""".stripMargin) { (s, dir) =>
    Timeseries.scd2(Tables(s, dir, "events"),
        "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "version")
  }

  /** E20 — Markov transition matrix with integer-exact ppm
    * probabilities (`div` / `//` keep both engines in integer space).
    */
  val qTransitions: GateQuery = GateQuery(
    "q_transitions",
    """WITH p AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts), event_id) AS from_type,
      |         event_type AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
      |      WHERE from_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST((n * 1000000) // (SUM(n) OVER (PARTITION BY from_type)) AS BIGINT)
      |    AS prob_ppm
      |FROM c ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
    Timeseries.transitionMatrix(Tables(s, dir, "events"),
        "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type")
  }

  /** E23 — interval coalescing: every event opens a 30-minute
    * validity window; overlapping windows union into maximal
    * disjoint activity islands per user. Running-max boundary (an
    * early long interval can swallow several later ones — lag(end)
    * would split them wrongly), pure integer µs.
    */
  val qIntervalCoalesce: GateQuery = GateQuery(
    "q_interval_coalesce",
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + 1800000000 AS e, event_id
      |  FROM events),
      |o AS (
      |  SELECT user_id, s, e,
      |    CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_island, event_id
      |  FROM iv),
      |g AS (
      |  SELECT user_id, s, e,
      |    CAST(SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      |  FROM o)
      |SELECT user_id, island, MIN(s) AS start_us, MAX(e) AS end_us,
      |  COUNT(*) AS n_merged
      |FROM g GROUP BY user_id, island
      |ORDER BY user_id, island""".stripMargin) { (s, dir) =>
    val iv = Tables(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 1800000000L).as("e"), col("event_id"))
    Timeseries.coalesceIntervals(iv, "user_id", "s", "e", "event_id")
      .orderBy("user_id", "island")
  }

  /** E24 — hopping (sliding) window aggregate: 1-hour windows sliding
    * every 30 minutes, so each event lands in exactly two windows.
    * Spark's `window(ts, len, slide)` aligns starts to slide
    * multiples since epoch; the oracle replays that as a UNION of the
    * two 30-minute-floor-aligned starts per event — pure integer µs.
    */
  val qSlidingWindow: GateQuery = GateQuery(
    "q_sliding_window",
    """WITH t AS (
      |  SELECT epoch_us(ts) AS t_us, event_type,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events),
      |w AS (
      |  SELECT CAST((t_us // 1800000000) * 1800000000 AS BIGINT) AS win_us,
      |    event_type, v FROM t
      |  UNION ALL
      |  SELECT CAST((t_us // 1800000000) * 1800000000 - 1800000000 AS BIGINT)
      |    AS win_us, event_type, v FROM t)
      |SELECT win_us, event_type, COUNT(*) AS n,
      |  CAST(SUM(v) AS DOUBLE) AS total_value
      |FROM w GROUP BY 1, 2
      |ORDER BY win_us, event_type""".stripMargin) { (s, dir) =>
    val src = Tables(s, dir, "events")
      .withColumn("value", col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
    graft.streaming.StreamingOps.hoppingCounts(src)
      .select(unix_micros(col("win_start")).as("win_us"), col("event_type"),
        col("n"), col("total_value").cast("double").as("total_value"))
      .orderBy("win_us", "event_type")
  }

  /** E25 — rolling z-score anomalies: x more than 3σ from the mean of
    * the 20 preceding same-type values (≥10 of history required).
    * Float-free: z² > 9 ⟺ (n·x−S)² > 9·(n·Q−S²) in exact cents —
    * the oracle replays the inequality term-for-term.
    */
  val qAnomaly: GateQuery = GateQuery(
    "q_anomaly",
    """WITH o AS (
      |  SELECT event_id, event_type, epoch_us(ts) AS t_us,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
      |  FROM events),
      |w AS (
      |  SELECT event_id, event_type, x,
      |    COUNT(x) OVER win AS n,
      |    CAST(COALESCE(SUM(x) OVER win, 0) AS BIGINT) AS s,
      |    CAST(COALESCE(SUM(x * x) OVER win, 0) AS BIGINT) AS q
      |  FROM o
      |  WINDOW win AS (PARTITION BY event_type ORDER BY t_us, event_id
      |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, event_type, x, CAST(n AS BIGINT) AS n_window
      |FROM w
      |WHERE n >= 10 AND (n*x - s)*(n*x - s) > 9 * (n*q - s*s)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Timeseries.rollingAnomalies(Tables(s, dir, "events"),
        "event_type", "ts", "value", "event_id")
      .orderBy("event_id")
  }

  /** E27 — OHLC bars per (event_type, hour): open/close picked by the
    * unique (t_us, event_id) key via min_by/max_by on the Spark side
    * and ROW_NUMBER on the oracle side — same total order, so the
    * picked doubles agree bit-for-bit; the only SUM runs over
    * floor-scaled integer micros (DuckDB's BIGINT sum is HUGEINT —
    * CAST back).
    */
  val qOhlcBars: GateQuery = GateQuery(
    "q_ohlc_bars",
    """WITH b AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bar,
      |    epoch_us(ts) AS t_us, event_id, value AS v,
      |    CAST(floor(value * 1000000) AS BIGINT) AS v_micro
      |  FROM events),
      |r AS (
      |  SELECT event_type, bar, v,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, bar
      |                       ORDER BY t_us, event_id) AS rn_a,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, bar
      |                       ORDER BY t_us DESC, event_id DESC) AS rn_d
      |  FROM b),
      |agg AS (
      |  SELECT event_type, bar, MAX(v) AS high_v, MIN(v) AS low_v,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(v_micro) AS BIGINT) AS vol_micro
      |  FROM b GROUP BY 1, 2),
      |o AS (SELECT event_type, bar, v AS open_v FROM r WHERE rn_a = 1),
      |c AS (SELECT event_type, bar, v AS close_v FROM r WHERE rn_d = 1)
      |SELECT a.event_type, epoch_us(a.bar) AS bar_us, o.open_v, a.high_v,
      |  a.low_v, c.close_v, a.n, a.vol_micro
      |FROM agg a
      |JOIN o USING (event_type, bar) JOIN c USING (event_type, bar)
      |ORDER BY event_type, bar_us""".stripMargin) { (s, dir) =>
    Timeseries.ohlcBars(Tables(s, dir, "events"),
        "event_type", "ts", "value", "event_id")
      .select(col("event_type"), unix_micros(col("bar")).as("bar_us"),
        col("open_v"), col("high_v"), col("low_v"), col("close_v"),
        col("n"), col("vol_micro"))
      .orderBy("event_type", "bar_us")
  }

  /** E28 — integer-exact EWMA (α = 30%): the oracle replays the
    * sequential fold as a recursive CTE over row-numbered events —
    * every floor step must agree or the series diverges from that
    * point on.
    */
  val qEwma: GateQuery = GateQuery(
    "q_ewma",
    """WITH RECURSIVE x AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, event_id AS tie,
      |    CAST(floor(value * 1000000) AS BIGINT) AS x,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, t_us, tie, x, rn, x AS y FROM x WHERE rn = 1
      |  UNION ALL
      |  SELECT x.user_id, x.t_us, x.tie, x.x, x.rn,
      |    CAST((30 * x.x + 70 * r.y) // 100 AS BIGINT) AS y
      |  FROM x JOIN r ON x.user_id = r.user_id AND x.rn = r.rn + 1)
      |SELECT user_id, t_us, tie, x AS x_micro, CAST(y AS BIGINT) AS ewma_micro
      |FROM r
      |ORDER BY user_id, t_us, tie""".stripMargin) { (s, dir) =>
    Timeseries.ewma(Tables(s, dir, "events"),
        "user_id", "ts", "value", "event_id", alphaPct = 30)
      .orderBy("user_id", "t_us", "tie")
  }

  /** E58 — Holt double exponential smoothing (level + trend), the
    * drift-following upgrade of q_ewma: the oracle replays BOTH
    * recursions (level feeding trend within one step — the new level
    * expression appears verbatim inside the trend term, since a
    * recursive CTE has no lateral alias) plus the l_1 = x_1 / b_1 = 0
    * seed and the per-row one-step forecast. Integer micros; `div`
    * truncates toward zero on both engines, so negative trends replay
    * exactly.
    */
  val qHolt: GateQuery = GateQuery(
    "q_holt",
    """WITH RECURSIVE x AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, event_id AS tie,
      |    CAST(floor(value * 1000000) AS BIGINT) AS x,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, t_us, tie, x, rn, x AS l, CAST(0 AS BIGINT) AS b
      |  FROM x WHERE rn = 1
      |  UNION ALL
      |  SELECT x.user_id, x.t_us, x.tie, x.x, x.rn,
      |    CAST((30 * x.x + 70 * (r.l + r.b)) // 100 AS BIGINT) AS l,
      |    CAST((20 * (CAST((30 * x.x + 70 * (r.l + r.b)) // 100 AS BIGINT) - r.l) + 80 * r.b) // 100 AS BIGINT) AS b
      |  FROM x JOIN r ON x.user_id = r.user_id AND x.rn = r.rn + 1)
      |SELECT user_id, t_us, tie, x AS x_micro, CAST(l AS BIGINT) AS level_micro,
      |  CAST(b AS BIGINT) AS trend_micro, CAST(l + b AS BIGINT) AS forecast_micro
      |FROM r
      |ORDER BY user_id, t_us, tie""".stripMargin) { (s, dir) =>
    Timeseries.holt(Tables(s, dir, "events"),
        "user_id", "ts", "value", "event_id", alphaPct = 30, betaPct = 20)
      .orderBy("user_id", "t_us", "tie")
  }

  /** E60 — per-user sequence-integrity audit over event_id as the
    * per-key sequence: running seen/missing/regression counters per
    * event. The oracle replays the running-max window, the gap and
    * regression derivations, and both running sums — an off-by-one in
    * the gap arithmetic or a frame that includes the current row in
    * the prior-max shifts every later row and breaks the hash.
    */
  val qSeqAudit: GateQuery = GateQuery(
    "q_seq_audit",
    """WITH o AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, event_id AS tie,
      |    CAST(event_id AS BIGINT) AS seq
      |  FROM events),
      |w AS (
      |  SELECT user_id, t_us, tie, seq,
      |    MAX(seq) OVER (PARTITION BY user_id ORDER BY t_us, tie
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t_us, tie)
      |      AS BIGINT) AS n_seen
      |  FROM o),
      |g AS (
      |  SELECT user_id, t_us, tie, seq, n_seen,
      |    CASE WHEN pm IS NULL OR seq <= pm THEN 0 ELSE seq - pm - 1 END AS gap,
      |    CASE WHEN pm IS NOT NULL AND seq <= pm THEN 1 ELSE 0 END AS reg
      |  FROM w)
      |SELECT user_id, t_us, tie, seq, n_seen,
      |  CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY t_us, tie
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS missing_total,
      |  CAST(SUM(reg) OVER (PARTITION BY user_id ORDER BY t_us, tie
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_regress
      |FROM g
      |ORDER BY user_id, t_us, tie""".stripMargin) { (s, dir) =>
    Timeseries.sequenceAudit(Tables(s, dir, "events"),
        "user_id", "ts", "event_id", "event_id")
      .orderBy("user_id", "t_us", "tie")
  }

  /** E34 — per-type linear value trend; the oracle replays origin,
    * hour index, all five sums, the zero-denominator guard, and the
    * integral slope. DuckDB SUMs widen to HUGEINT — every sum and the
    * `//` lines are CAST back.
    */
  val qLinearTrend: GateQuery = GateQuery(
    "q_linear_trend",
    """WITH b AS (
      |  SELECT event_type, epoch_us(ts) AS t_us,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
      |  FROM events),
      |o AS (SELECT event_type, MIN(t_us) AS t0 FROM b GROUP BY 1),
      |xy AS (
      |  SELECT b.event_type, CAST((b.t_us - o.t0) // 3600000000 AS BIGINT) AS x, b.y
      |  FROM b JOIN o USING (event_type)),
      |s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      |  FROM xy GROUP BY 1)
      |SELECT event_type, n,
      |  CAST(sy // n AS BIGINT) AS mean_y_cents,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |       ELSE CAST((100 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS BIGINT)
      |       END AS slope_centi_per_hr
      |FROM s
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Timeseries.linearTrend(Tables(s, dir, "events"), "event_type", "ts", "value")
      .orderBy("event_type")
  }

  /** D78 — MAD robust outlier audit per event type: discrete medians
    * over exact cents make every number and the k·MAD compare
    * engine-exact.
    */
  val qMadOutliers: GateQuery = GateQuery(
    "q_mad_outliers",
    """WITH y AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS yc
      |  FROM events),
      |med AS (SELECT event_type,
      |          CAST(quantile_disc(yc, 0.5) AS BIGINT) AS med_cents
      |        FROM y GROUP BY 1),
      |dev AS (SELECT y.event_type, y.yc, med.med_cents,
      |          abs(y.yc - med.med_cents) AS ad
      |        FROM y JOIN med USING (event_type)),
      |mad AS (SELECT event_type,
      |          CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad_cents
      |        FROM dev GROUP BY 1)
      |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MAX(d.med_cents) AS BIGINT) AS med_cents,
      |  CAST(MAX(m.mad_cents) AS BIGINT) AS mad_cents,
      |  CAST(COUNT(*) FILTER (WHERE d.ad > 5 * m.mad_cents) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY 1
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    graft.operators.Quality.robustOutliers(
        Tables(s, dir, "events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** D84 — Pareto frontier of parts minimizing (retail price, size):
    * the oracle replays the per-x collapse, the strict running-min
    * test, and the at-point row count.
    */
  val qPareto: GateQuery = GateQuery(
    "q_pareto",
    """WITH perx AS (
      |  SELECT p_retailprice AS x, MIN(p_size) AS y FROM part GROUP BY 1),
      |f AS (SELECT x, y,
      |        MIN(y) OVER (ORDER BY x
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
      |      FROM perx),
      |fr AS (SELECT x, y FROM f WHERE rm IS NULL OR y < rm),
      |ap AS (SELECT p_retailprice AS x, p_size AS y, COUNT(*) AS n_rows
      |       FROM part GROUP BY 1, 2)
      |SELECT fr.x, fr.y, ap.n_rows
      |FROM fr JOIN ap USING (x, y)
      |ORDER BY x""".stripMargin) { (s, dir) =>
    graft.operators.Timeseries.paretoFrontier(
        Tables(s, dir, "part"), "p_retailprice", "p_size")
      .orderBy("x")
  }

  /** E36 — hour-of-day seasonal profile: per (event_type, hour) the
    * integer-exact expected value (micros, floor-div mean) and the
    * residual magnitude Σ|x − mean| that the expectation fails to
    * explain. The oracle replays the micro floor, the integral mean,
    * and the residual sum — every number bit-replayable (value ≥ 0 in
    * testdata, so Spark's truncating `div` and DuckDB's flooring `//`
    * agree; a float mean would never hash-match).
    */
  val qSeasonal: GateQuery = GateQuery(
    "q_seasonal",
    """WITH base AS (
      |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
      |    CAST(FLOOR(value * 1000000) AS BIGINT) AS x
      |  FROM events),
      |prof AS (
      |  SELECT event_type, hod, COUNT(*) AS n, SUM(x) AS sx
      |  FROM base GROUP BY 1, 2),
      |p2 AS (SELECT event_type, hod, n,
      |         CAST(sx // n AS BIGINT) AS mean_micro FROM prof),
      |resid AS (
      |  SELECT b.event_type, b.hod, SUM(ABS(b.x - p.mean_micro)) AS sad_micro
      |  FROM base b JOIN p2 p USING (event_type, hod)
      |  GROUP BY 1, 2)
      |SELECT p.event_type, p.hod, CAST(p.n AS BIGINT) AS n,
      |  CAST(p.mean_micro AS BIGINT) AS mean_micro,
      |  CAST(r.sad_micro AS BIGINT) AS sad_micro
      |FROM p2 p JOIN resid r USING (event_type, hod)
      |ORDER BY event_type, hod""".stripMargin) { (s, dir) =>
    graft.operators.Timeseries.seasonalProfile(
        Tables(s, dir, "events"), "event_type", "ts", "value")
      .orderBy("event_type", "hod")
  }

  /** E38 — seasonally-adjusted anomalies: flag events whose deviation
    * from the (event_type, hour-of-day) seasonal mean exceeds 3× the
    * profile's mean absolute deviation, via the integer
    * cross-multiplied compare |x−mean|·n > 3·sad. The oracle rebuilds
    * the whole profile and replays the compare — a drifted mean, a
    * wrong n, or a float threshold all change the flagged set.
    */
  val qSeasonalAnomaly: GateQuery = GateQuery(
    "q_seasonal_anomaly",
    """WITH base AS (
      |  SELECT event_id, event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
      |    CAST(FLOOR(value * 1000000) AS BIGINT) AS x
      |  FROM events),
      |prof AS (
      |  SELECT event_type, hod, COUNT(*) AS n, SUM(x) AS sx
      |  FROM base GROUP BY 1, 2),
      |p2 AS (SELECT event_type, hod, n,
      |         CAST(sx // n AS BIGINT) AS mean_micro FROM prof),
      |resid AS (
      |  SELECT b.event_type, b.hod, CAST(SUM(ABS(b.x - p.mean_micro)) AS BIGINT) AS sad_micro
      |  FROM base b JOIN p2 p USING (event_type, hod)
      |  GROUP BY 1, 2)
      |SELECT b.event_id, b.event_type, b.hod, b.x AS x_micro,
      |  p.mean_micro, CAST(ABS(b.x - p.mean_micro) AS BIGINT) AS dev_micro
      |FROM base b
      |JOIN p2 p USING (event_type, hod)
      |JOIN resid r USING (event_type, hod)
      |WHERE ABS(b.x - p.mean_micro) * p.n > 3 * r.sad_micro
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    graft.operators.Timeseries.seasonalAnomalies(
        Tables(s, dir, "events"), "event_id", "event_type", "ts", "value", k = 3)
      .orderBy("event_id")
  }

  /** E39 — one-sided CUSUM changepoint alarms: per event_type over
    * the (ts, event_id)-ordered series, S_t = max(0, S_{t−1} +
    * (x − mean − slack)) flags where it exceeds the threshold — the
    * sustained-level-shift detector point detectors (E21/E38) miss.
    * Computed windowed via S_t = P_t − min(0, min_prefix P): the
    * oracle replays the micro floor, the integral mean, both running
    * windows (DuckDB needs them in two CTE levels — window calls
    * can't nest), and the alarm cut. slack 10, threshold 200 value
    * units: 1644 alarms at sf0.01 and 99 at sf0.001 — a real alarm
    * set at BOTH verification scales, never the corpus.
    */
  val qCusum: GateQuery = GateQuery(
    "q_cusum",
    """WITH base AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(FLOOR(value * 1000000) AS BIGINT) AS x_micro
      |  FROM events),
      |m AS (SELECT event_type, CAST(SUM(x_micro) // COUNT(*) AS BIGINT) AS mean_micro
      |      FROM base GROUP BY 1),
      |d AS (SELECT b.*, b.x_micro - m.mean_micro - 10000000 AS dd
      |      FROM base b JOIN m USING (event_type)),
      |p AS (SELECT *, SUM(dd) OVER w AS pp
      |      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |p2 AS (SELECT *, MIN(pp) OVER w2 AS mp
      |       FROM p WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id
      |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, ts, event_id, x_micro,
      |  CAST(pp - LEAST(0, mp) AS BIGINT) AS cusum_micro
      |FROM p2
      |WHERE pp - LEAST(0, mp) > 200000000
      |ORDER BY event_type, ts, event_id""".stripMargin) { (s, dir) =>
    graft.operators.Timeseries.cusumChangepoints(
        Tables(s, dir, "events"), "event_type", "ts", "event_id", "value",
        slackMicro = 10000000L, thresholdMicro = 200000000L)
      .orderBy("event_type", "ts", "event_id")
  }

  val all: Seq[GateQuery] =
    Seq(qGapfill, qScd2, qTransitions, qIntervalCoalesce, qSlidingWindow,
      qAnomaly, qOhlcBars, qEwma, qHolt, qSeqAudit, qLinearTrend, qMadOutliers, qPareto,
      qSeasonal, qSeasonalAnomaly, qCusum)
}
