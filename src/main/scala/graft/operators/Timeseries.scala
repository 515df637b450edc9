package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log shaping operators (SURVEY.md §2.E18–E20): gap-filled
  * time series, SCD2 validity intervals, and Markov transition
  * matrices. All three follow the same 100 TB discipline as the rest
  * of the E-section: the only corpus-sized exchange is one hash
  * partition on the natural key (hour bucket or entity id); every
  * derived table after that is dimension-sized (hours × types,
  * segments, |types|²) and broadcast where joined.
  */
object Timeseries {

  /** E18 — gap-filled hourly series: every (group, hour) cell between
    * the corpus' min and max hour, zero-filled where no events landed.
    * Dashboards and window-over-time models need the dense grid — a
    * groupBy alone silently drops empty buckets.
    *
    * Scale shape: the corpus collapses to the hourly aggregate in ONE
    * map-side-partial exchange; the (mn, mx) bounds are a single-row
    * aggregate; the dense grid is |groups| × |hours| — dimension-sized
    * by construction (a year is 8,760 hours) — so the grid build and
    * the fill join are broadcast, never a corpus shuffle.
    */
  def gapFillHourly(events: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(groupCol), date_trunc("hour", col(tsCol)).as("hh"))
      .agg(count(lit(1)).as("n"))
    val hours = hourly.agg(min("hh").as("mn"), max("hh").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hh"))
    val grid = events.select(groupCol).distinct().crossJoin(broadcast(hours))
    grid.join(broadcast(hourly), Seq(groupCol, "hh"), "left")
      .select(col(groupCol), unix_micros(col("hh")).as("hour_us"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** E19 — SCD2 compression of an event log: consecutive events with
    * the same status collapse into one versioned validity interval
    * [valid_from_us, valid_to_us) per entity; the current segment's
    * valid_to_us is -1 (open). This is the change-data-capture shape
    * that turns an append-only log into a slowly-changing dimension.
    *
    * Scale shape: one hash exchange on the entity id feeds both
    * windows and the segment aggregate (same-key windows reuse the
    * partitioning — no second exchange); per-entity history is the
    * window frame, which is the inherent unit of SCD2 work.
    */
  def scd2(events: DataFrame, idCol: String, tsCol: String,
      statusCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col("t_us"), col(tieCol))
    val o = events.select(col(idCol), col(statusCol).as("status"),
        unix_micros(col(tsCol)).as("t_us"), col(tieCol))
      .withColumn("chg",
        when(lag("status", 1).over(w).isNull ||
          lag("status", 1).over(w) =!= col("status"), 1).otherwise(0))
      .withColumn("grp", sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val seg = o.groupBy(col(idCol), col("grp").cast("long").as("version"), col("status"))
      .agg(min("t_us").as("valid_from_us"), count(lit(1)).as("n_events"))
    val wv = Window.partitionBy(idCol).orderBy("version")
    seg.withColumn("valid_to_us",
        coalesce(lead("valid_from_us", 1).over(wv), lit(-1L)))
      .select(col(idCol), col("version"), col("status"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"))
  }

  /** E23 — interval coalescing (gaps-and-islands union): overlapping
    * or touching [start, end) intervals per entity merge into maximal
    * disjoint islands. The activity-coverage primitive sessionize
    * does not give: sessions split on GAPS between points, islands
    * union SPANS — e.g. per-event validity windows, lease ranges,
    * incident windows.
    *
    * Scale shape: one hash exchange on the entity id; the island
    * boundary is `start > max(end) over all preceding intervals`
    * (running max — NOT lag(end): an earlier long interval can
    * swallow several later ones), then the island aggregate reuses
    * the same partitioning. Pure integer µs compares — engine-exact.
    */
  def coalesceIntervals(intervals: DataFrame, idCol: String,
      startCol: String, endCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col(startCol), col(tieCol))
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = intervals
      .withColumn("__new", when(prevMaxEnd.isNull ||
        col(startCol) > prevMaxEnd, 1).otherwise(0))
      .withColumn("island",
        sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
    flagged.groupBy(col(idCol), col("island"))
      .agg(min(startCol).as("start_us"), max(endCol).as("end_us"),
        count(lit(1)).as("n_merged"))
  }

  /** E20 — first-order Markov transition matrix over per-entity event
    * sequences: counts and fixed-point ppm probabilities for every
    * observed (from, to) event-type pair. Session-path analysis and
    * next-event models consume exactly this table.
    *
    * Scale shape: the lag window is the one corpus exchange (hash on
    * the entity id); the pair table then collapses to at most
    * |types|² rows, so the per-from totals join is a broadcast of a
    * dimension-sized table. prob_ppm is integer `div` — engine-exact,
    * no float division to disagree over.
    */
  /** E25 — rolling z-score anomaly detection, integer-exact: a value
    * is anomalous when it sits more than k standard deviations from
    * the mean of the `lookback` PRECEDING values in its group. The
    * float-free trick: with n/S/Q the preceding count/sum/sum-of-
    * squares over integer-scaled x (value in exact cents),
    *
    *   z² > k²  ⟺  (n·x − S)² > k²·(n·Q − S²)
    *
    * — both sides pure Long arithmetic, so the flag replays exactly
    * in any engine (no sqrt, no float σ). `minN` suppresses flags
    * until the window has enough history.
    *
    * Scale shape: ONE hash exchange on the group key feeds the three
    * same-frame window aggregates (one Window physical op); the
    * filter is a zero-shuffle projection. Long-safe while
    * lookback·x² stays under ~9·10^18 — x up to ~2·10^7 cents at the
    * default 20-row frame.
    */
  def rollingAnomalies(events: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, tieCol: String, lookback: Int = 20, minN: Int = 10,
      k: Int = 3): DataFrame = {
    val win = Window.partitionBy(groupCol)
      .orderBy(col("t_us"), col(tieCol))
      .rowsBetween(-lookback, -1)
    events
      .select(col(tieCol), col(groupCol), unix_micros(col(tsCol)).as("t_us"),
        (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("x"))
      .withColumn("n", count(col("x")).over(win))
      .withColumn("s", coalesce(sum("x").over(win), lit(0L)))
      .withColumn("q", coalesce(sum(col("x") * col("x")).over(win), lit(0L)))
      .filter(col("n") >= minN &&
        (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s")) >
          lit(k.toLong * k) * (col("n") * col("q") - col("s") * col("s")))
      .select(col(tieCol), col(groupCol), col("x"), col("n").as("n_window"))
  }

  /** E27 — OHLC downsampling bars: per (group, hour bucket) the
    * open/close values (first/last by the unique (t_us, tie) key —
    * deterministic, never "any value"), high/low, event count, and
    * integer-micro volume. The resample primitive that turns a raw
    * tick/event stream into the fixed-grid bars dashboards and
    * sequence models consume. Open/close/high/low are SINGLE picked
    * doubles — no float accumulation, so they are bit-exact on any
    * engine; the only SUM runs over floor-scaled integer micros.
    *
    * Scale shape: ONE map-side-partial exchange keyed (group, bar);
    * open/close are `min_by`/`max_by` over the (t_us, tie) struct —
    * pure aggregates, no per-bar sort, no window.
    */
  def ohlcBars(events: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val b = events.select(col(groupCol),
      date_trunc("hour", col(tsCol)).as("bar"),
      unix_micros(col(tsCol)).as("t_us"), col(tieCol).as("tie"),
      col(valueCol).as("v"),
      floor(col(valueCol) * 1000000).cast("long").as("v_micro"))
    b.groupBy(col(groupCol), col("bar"))
      .agg(
        min_by(col("v"), struct(col("t_us"), col("tie"))).as("open_v"),
        max("v").as("high_v"),
        min("v").as("low_v"),
        max_by(col("v"), struct(col("t_us"), col("tie"))).as("close_v"),
        count(lit(1)).as("n"),
        sum("v_micro").as("vol_micro"))
  }

  /** E28 — EWMA smoothing, integer-exact: over micro-scaled values in
    * (t_us, tie) order per key,
    *
    *   y_1 = x_1;   y_t = (α·x_t + (100−α)·y_{t−1}) div 100
    *
    * with α an integer percent — every step is floor arithmetic, so
    * any engine replays the whole series bit-for-bit (a float EWMA
    * never survives an engine swap). The recursion is inherently
    * sequential per key, so it runs as ONE ordered higher-order
    * `aggregate` fold over `sort_array(collect_list(...))` — no
    * driver loop, no self-join per step.
    *
    * Scale shape: one exchange keyed by the entity; the per-key
    * history must fit one task (the listagg/SCD2 assumption — keys
    * are entities, not the corpus). The fold emits the running y at
    * every row, then explodes back to rows.
    */
  def ewma(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, alphaPct: Int): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 99, s"invalid alphaPct $alphaPct")
    val rows = events.select(col(keyCol),
      struct(unix_micros(col(tsCol)).as("t_us"), col(tieCol).as("tie"),
        floor(col(valueCol) * 1000000).cast("long").as("x")).as("r"))
    val packed = rows.groupBy(keyCol).agg(sort_array(collect_list("r")).as("xs"))
    val folded = packed.withColumn("ys", expr(
      s"""aggregate(xs,
         |  CAST(array() AS ARRAY<STRUCT<t_us: BIGINT, tie: BIGINT, x: BIGINT, y: BIGINT>>),
         |  (acc, e) -> array_append(acc, named_struct(
         |    't_us', e.t_us, 'tie', e.tie, 'x', e.x,
         |    'y', CASE WHEN size(acc) = 0 THEN e.x
         |         ELSE ($alphaPct * e.x + ${100 - alphaPct} * element_at(acc, -1).y) div 100
         |         END)))""".stripMargin))
    folded.select(col(keyCol), explode(col("ys")).as("e"))
      .select(col(keyCol), col("e.t_us").as("t_us"), col("e.tie").as("tie"),
        col("e.x").as("x_micro"), col("e.y").as("ewma_micro"))
  }

  /** E58 — Holt double exponential smoothing (Holt 1957: level +
    * trend), integer-exact in micros — the drift-following upgrade of
    * the E28 EWMA (which lags any trending series by a constant):
    *
    *   l_t = (α·x_t + (100−α)·(l_{t−1} + b_{t−1})) div 100
    *   b_t = (β·(l_t − l_{t−1}) + (100−β)·b_{t−1}) div 100
    *
    * seeded l_1 = x_1, b_1 = 0; emits per event the level, trend, and
    * the one-step-ahead forecast l + b (what a monitor compares the
    * NEXT observation against). All terms Long micros, `div` on both
    * engines truncates toward zero, so the recursion replays
    * bit-for-bit. Same scale shape as [[ewma]]: one shuffle to the
    * key, per-key sort + linear fold, state two Longs per step.
    */
  def holt(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, alphaPct: Int, betaPct: Int): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 99, s"invalid alphaPct $alphaPct")
    require(betaPct >= 1 && betaPct <= 99, s"invalid betaPct $betaPct")
    val rows = events.select(col(keyCol),
      struct(unix_micros(col(tsCol)).as("t_us"), col(tieCol).as("tie"),
        floor(col(valueCol) * 1000000).cast("long").as("x")).as("r"))
    val packed = rows.groupBy(keyCol).agg(sort_array(collect_list("r")).as("xs"))
    val folded = packed.withColumn("ys", expr(
      s"""aggregate(xs,
         |  CAST(array() AS ARRAY<STRUCT<t_us: BIGINT, tie: BIGINT, x: BIGINT, l: BIGINT, b: BIGINT>>),
         |  (acc, e) -> array_append(acc,
         |    CASE WHEN size(acc) = 0
         |    THEN named_struct('t_us', e.t_us, 'tie', e.tie, 'x', e.x,
         |      'l', e.x, 'b', CAST(0 AS BIGINT))
         |    ELSE named_struct('t_us', e.t_us, 'tie', e.tie, 'x', e.x,
         |      'l', ($alphaPct * e.x + ${100 - alphaPct} *
         |            (element_at(acc, -1).l + element_at(acc, -1).b)) div 100,
         |      'b', ($betaPct * (($alphaPct * e.x + ${100 - alphaPct} *
         |              (element_at(acc, -1).l + element_at(acc, -1).b)) div 100
         |              - element_at(acc, -1).l)
         |            + ${100 - betaPct} * element_at(acc, -1).b) div 100)
         |    END))""".stripMargin))
    folded.select(col(keyCol), explode(col("ys")).as("e"))
      .select(col(keyCol), col("e.t_us").as("t_us"), col("e.tie").as("tie"),
        col("e.x").as("x_micro"), col("e.l").as("level_micro"),
        col("e.b").as("trend_micro"),
        (col("e.l") + col("e.b")).as("forecast_micro"))
  }

  /** E60 — per-key SEQUENCE-INTEGRITY audit (the Kafka/CDC offset
    * question: did anything go missing, duplicate, or arrive out of
    * order per key?): events ordered by (event time, tie) carry a
    * per-key sequence number; each row reports the RUNNING census —
    * events seen, total missing sequence slots (gaps ahead of the
    * running max), and regressions (a sequence at or below the
    * running max: a duplicate or an out-of-order delivery). Pure
    * window arithmetic — no recursion — so the oracle replays it
    * verbatim, and the streaming twin (E61) folds the same three
    * counters as two Longs + two counts of state.
    */
  def sequenceAudit(events: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(col("t_us"), col("tie"))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    events.select(col(keyCol),
        unix_micros(col(tsCol)).as("t_us"),
        col(tieCol).as("tie"), col(seqCol).cast("long").as("seq"))
      .withColumn("__pm", max("seq").over(prior))
      .withColumn("__regress",
        (col("__pm").isNotNull && col("seq") <= col("__pm")).cast("long"))
      .withColumn("__gap",
        when(col("__pm").isNull || col("seq") <= col("__pm"), 0L)
          .otherwise(col("seq") - col("__pm") - 1L))
      .withColumn("n_seen", row_number().over(w).cast("long"))
      .withColumn("missing_total", sum("__gap").over(run))
      .withColumn("n_regress", sum("__regress").over(run))
      .select(col(keyCol), col("t_us"), col("tie"), col("seq"),
        col("n_seen"), col("missing_total"), col("n_regress"))
  }

  /** E34 — per-group linear trend, integer-exact least squares: slope
    * of value-vs-time from the classical sum formulation
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * with x = whole hours since the GROUP's first event (per-group
    * origin keeps x small) and y = exact cents (the rollingAnomalies
    * scaling) — every term a Long, the final slope an integral `div`
    * at centi-cent-per-hour resolution, so the drift estimate replays
    * exactly in any engine (a float regression never does). Groups
    * whose events all land in one hour have zero denominator → NULL
    * slope. Overflow bound: |n·Σxy| ≤ n²·xmax·ymax must stay under
    * 2⁶³ — at cents and hour-granularity that is ~10⁸ rows per group
    * per year of span.
    *
    * Scale shape: one map-side-partial aggregate for the per-group
    * origin, broadcast back, then ONE map-side-partial aggregate for
    * the five sums — the corpus never shuffles raw rows twice.
    */
  def linearTrend(events: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val base = events.select(col(groupCol),
      unix_micros(col(tsCol)).as("t_us"),
      (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast("long").as("y"))
    val origins = base.groupBy(groupCol).agg(min("t_us").as("t0"))
    val xy = base.join(broadcast(origins), groupCol)
      .withColumn("x", expr("(t_us - t0) div 3600000000"))
    xy.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col(groupCol), col("n"),
        expr("sy div n").as("mean_y_cents"),
        expr("""CASE WHEN n * sxx - sx * sx = 0 THEN NULL
               |ELSE (100 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)
               |END""".stripMargin).as("slope_centi_per_hr"))
  }

  /** D84 — Pareto frontier (skyline) on two minimized dimensions:
    * the points no other point beats on BOTH axes (strict on at least
    * one) — the multi-objective shortlist query (cheapest-and-
    * smallest part, shortest-and-freshest doc) that a top-k on any
    * single score cannot express.
    *
    * O(n log n), not the naive Θ(n²) dominance self-join: collapse to
    * one (x, min y) row per x (same-x rows with larger y are
    * dominated within the group), then a point survives iff its y is
    * STRICTLY below the running min of y over all smaller x.
    *
    * The running min is TWO-PHASE (the Prep.shuffleDeterministic
    * shape), never a global single-partition window: the collapsed
    * set range-partitions on x into order-aligned buckets, each
    * bucket computes its exclusive running min in parallel, and the
    * cross-bucket carry-in is the exclusive prefix min of the
    * |buckets|-row bucket-min table (a driver-sized window,
    * broadcast back). On a continuous-valued x — prices, scores, the
    * typical skyline axes — |distinct x| ≈ |corpus|, so a global
    * `Window.orderBy(x)` would funnel the whole corpus through ONE
    * task; bucketing keeps every corpus-sized stage parallel.
    * Bucket boundaries come from the range partitioner's sampler and
    * affect PARALLELISM only — the prefix combine is exact for any
    * order-aligned bucketing. The bucketed frame is localCheckpointed
    * once so the rank branch and the bucket-min branch can never see
    * different sampled boundaries.
    *
    * @return (x, y, n_rows) — frontier points with the count of rows
    *         at that exact point
    */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .groupBy("x").agg(min("y").as("y"))
    val bucketed = perX.repartitionByRange(256, col("x"))
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint()
    val inBucket = Window.partitionBy("__bucket").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bucketed.groupBy("__bucket").agg(min("y").as("__bmin"))
      .withColumn("__rm_pre",
        // unpartitioned by design: input = one row per range bucket
        // (256 rows), pinned by PlanSpec "bounded prefix windows"
        min("__bmin").over(Window.orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("__bucket", "__rm_pre")
    val frontier = bucketed
      .withColumn("__rm_in", min("y").over(inBucket))
      .join(broadcast(prefix), "__bucket")
      // least() skips NULLs: rm is NULL only for the very first point
      // (no bucket before it, no row before it in its bucket)
      .withColumn("rm", least(col("__rm_in"), col("__rm_pre")))
      .filter(col("rm").isNull || col("y") < col("rm"))
      .select("x", "y")
    // n_rows counts rows AT the frontier point (same x AND same y)
    val atPoint = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_rows"))
    frontier.join(atPoint, Seq("x", "y"))
  }

  /** E36 — hour-of-day seasonal decomposition (the seasonal-naive
    * baseline every anomaly detector and forecast is judged against:
    * the expected value of (group, hour-of-day), and how much signal
    * that expectation fails to explain). Integer-exact: values floor
    * to micros, the seasonal mean is the integral `sx div n`, and the
    * residual magnitude is `Σ|x − mean|` in micros — every number an
    * independent engine replays bit-for-bit, where a float mean never
    * would.
    *
    * Scale shape at 100 TB: two corpus aggregates keyed by the SAME
    * dimension-sized (group, hod) key — the profile (one map-side
    * partial exchange) and the residual sum (rows join the broadcast
    * 24·|groups|-row profile in the map stage, then partial-agg);
    * nothing corpus-sized is ever sorted or windowed.
    */
  def seasonalProfile(events: DataFrame, groupCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val base = events.select(col(groupCol).as("g"),
      hour(col(tsCol)).cast("int").as("hod"),
      floor(col(valCol) * 1000000).cast("long").as("x"))
    val prof = base.groupBy("g", "hod")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .select(col("g"), col("hod"), col("n"),
        expr("sx div n").as("mean_micro"))
    val resid = base.join(broadcast(prof.select("g", "hod", "mean_micro")),
        Seq("g", "hod"))
      .groupBy("g", "hod")
      .agg(sum(abs(col("x") - col("mean_micro"))).as("sad_micro"))
    prof.join(resid, Seq("g", "hod"))
      .select(col("g").as(groupCol), col("hod"), col("n"),
        col("mean_micro"), col("sad_micro"))
  }

  /** E38 — seasonally-adjusted anomaly flags: an event is anomalous
    * when its deviation from the (group, hour-of-day) seasonal mean
    * exceeds `k`× the profile's mean absolute deviation — the
    * seasonal-naive detector E36's profile exists to feed, and the
    * one a plain rolling z-score cannot imitate (a 9am spike is
    * normal at 9am and anomalous at 3am). Integer-exact: the flag is
    * the cross-multiplied compare |x − mean|·n > k·sad (both sides
    * BIGINT; sad/n IS the group's mean abs deviation), so no float
    * threshold ever drifts between engines.
    *
    * Scale shape: E36's two corpus aggregates build the profile; the
    * flag pass joins each row against the broadcast 24·|groups|-row
    * profile map-side — one corpus-keyed exchange total, nothing
    * sorted or windowed.
    */
  def seasonalAnomalies(events: DataFrame, idCol: String, groupCol: String,
      tsCol: String, valCol: String, k: Int): DataFrame = {
    require(k > 0, s"invalid threshold multiple $k")
    val prof = seasonalProfile(events, groupCol, tsCol, valCol)
      .select(col(groupCol), col("hod"), col("n"),
        col("mean_micro"), col("sad_micro"))
    events.select(col(idCol), col(groupCol),
        hour(col(tsCol)).cast("int").as("hod"),
        floor(col(valCol) * 1000000).cast("long").as("x_micro"))
      .join(broadcast(prof), Seq(groupCol, "hod"))
      .withColumn("dev_micro", abs(col("x_micro") - col("mean_micro")))
      .filter(col("dev_micro") * col("n") > lit(k.toLong) * col("sad_micro"))
      .select(col(idCol), col(groupCol), col("hod"), col("x_micro"),
        col("mean_micro"), col("dev_micro"))
  }

  /** E39 — one-sided CUSUM changepoint detection (Page 1954; the
    * standard sequential detector for a sustained LEVEL SHIFT, which
    * point detectors like E21/E38 structurally miss — ten successive
    * readings each 1.5 MADs high never trip a z-score but accumulate
    * here). Per group, over the (ts, tie)-ordered series:
    * S_t = max(0, S_{t−1} + (x_t − mean − slack)), flag when
    * S_t > threshold.
    *
    * The recursion LOOKS sequential but is window-expressible through
    * the prefix identity S_t = P_t − min(0, min_{j≤t} P_j) where
    * P_t = Σ_{j≤t}(x_t − mean − slack): a running sum and a running
    * min over the SAME (group, order) window — one corpus exchange,
    * both windows sharing the sort, no recursion, no UDAF. Per-group
    * sort is the inherent cost of any sequential detector (the ewma
    * precedent). Integer-exact: values floor to micros, the group
    * mean is the integral `sx div n`, slack/threshold are caller
    * micros — every S_t replays bit-for-bit in SQL.
    *
    * @return flagged rows (group, ts, tie, x_micro, cusum_micro) —
    *         the points where the accumulated upward drift exceeds
    *         `thresholdMicro`, i.e. the alarm set
    */
  def cusumChangepoints(events: DataFrame, groupCol: String, tsCol: String,
      tieCol: String, valCol: String,
      slackMicro: Long, thresholdMicro: Long): DataFrame = {
    require(slackMicro >= 0 && thresholdMicro > 0, "invalid CUSUM parameters")
    val base = events.select(col(groupCol).as("g"), col(tsCol).as("ts"),
      col(tieCol).as("tie"),
      floor(col(valCol) * 1000000).cast("long").as("x_micro"))
    val means = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x_micro").as("sx"))
      .select(col("g"), expr("sx div n").as("mean_micro"))
    val ord = Window.partitionBy("g").orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(means), Seq("g"))
      .withColumn("__d", col("x_micro") - col("mean_micro") - lit(slackMicro))
      .withColumn("__p", sum("__d").over(ord))
      .withColumn("cusum_micro",
        col("__p") - least(lit(0L), min("__p").over(ord)))
      .filter(col("cusum_micro") > thresholdMicro)
      .select(col("g").as(groupCol), col("ts").as(tsCol),
        col("tie").as(tieCol), col("x_micro"), col("cusum_micro"))
  }

  def transitionMatrix(events: DataFrame, idCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(idCol), col(tsCol), col(tieCol), col(typeCol).as("to_type"))
      .withColumn("from_type", lag("to_type", 1).over(w))
      .filter(col("from_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum("n").as("__tot"))
    counts.join(broadcast(totals), "from_type")
      .withColumn("prob_ppm", expr("n * 1000000 div __tot"))
      .select(col("from_type"), col("to_type"), col("n"), col("prob_ppm"))
  }
}
