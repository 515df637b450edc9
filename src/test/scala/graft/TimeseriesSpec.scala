package graft

import graft.operators.Timeseries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-worked fixtures for the E18–E20 event-log shaping operators:
  * a tiny log whose dense grid, SCD2 segments, and transition matrix
  * are computable on paper, plus partition invariance (the property
  * that matters when partition counts differ run to run).
  */
class TimeseriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (event_id, t_us, user_id, type); hours are whole for readability
  private val H = 3600L * 1000000L
  private val rows = Seq(
    (1L, 0 * H, 10L, "view"),
    (2L, 0 * H + 1L, 10L, "view"),
    (3L, 2 * H, 10L, "click"),     // hour 1 is a gap
    (4L, 3 * H, 10L, "view"),
    (5L, 0 * H, 20L, "click"),
    (6L, 3 * H, 20L, "click"))

  private def ev(parts: Int) = rows
    .toDF("event_id", "t_us", "user_id", "event_type")
    .withColumn("ts", timestamp_micros(col("t_us")))
    .repartition(parts)

  test("gapFillHourly emits the dense grid with zero-filled gaps") {
    for (parts <- Seq(1, 5)) {
      val got = Timeseries.gapFillHourly(ev(parts), "event_type", "ts")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // 2 types × hours 0..3 = 8 cells
      val expected = Set(
        ("view", 0 * H, 2L), ("view", 1 * H, 0L), ("view", 2 * H, 0L), ("view", 3 * H, 1L),
        ("click", 0 * H, 1L), ("click", 1 * H, 0L), ("click", 2 * H, 1L), ("click", 3 * H, 1L))
      assert(got === expected, s"parts=$parts")
    }
  }

  test("scd2 collapses consecutive same-status runs into versioned intervals") {
    for (parts <- Seq(1, 5)) {
      val got = Timeseries.scd2(ev(parts), "user_id", "ts", "event_type", "event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      val expected = Set(
        // user 10: view,view | click | view — three segments
        (10L, 1L, "view", 0 * H, 2 * H, 2L),
        (10L, 2L, "click", 2 * H, 3 * H, 1L),
        (10L, 3L, "view", 3 * H, -1L, 1L),
        // user 20: click,click — one open segment
        (20L, 1L, "click", 0 * H, -1L, 2L))
      assert(got === expected, s"parts=$parts")
    }
  }

  test("transitionMatrix counts per-user adjacent pairs with exact ppm") {
    for (parts <- Seq(1, 5)) {
      val got = Timeseries
        .transitionMatrix(ev(parts), "user_id", "ts", "event_type", "event_id")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      // user 10: view→view, view→click, click→view; user 20: click→click
      val expected = Set(
        ("view", "view", 1L, 500000L),
        ("view", "click", 1L, 500000L),
        ("click", "view", 1L, 500000L),
        ("click", "click", 1L, 500000L))
      assert(got === expected, s"parts=$parts")
    }
  }

  test("coalesceIntervals: swallowing interval, touching boundary, islands") {
    // user 1: [0,10) swallows [2,4) and [8,12) extends it -> [0,12);
    //         [12,15) touches 12? start 12 > maxEnd 12 is FALSE -> merges
    //         [20,25) is a new island
    // user 2: single interval
    val iv = Seq(
      (1L, 0L, 10L, 101L), (1L, 2L, 4L, 102L), (1L, 8L, 12L, 103L),
      (1L, 12L, 15L, 104L), (1L, 20L, 25L, 105L),
      (2L, 5L, 6L, 201L))
      .toDF("user_id", "s", "e", "event_id")
    for (parts <- Seq(1, 4)) {
      val got = graft.operators.Timeseries
        .coalesceIntervals(iv.repartition(parts), "user_id", "s", "e", "event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val expected = Set(
        (1L, 1L, 0L, 15L, 4L),
        (1L, 2L, 20L, 25L, 1L),
        (2L, 1L, 5L, 6L, 1L))
      assert(got === expected, s"parts=$parts")
    }
  }

  test("transitionMatrix ppm is floor division, rows sum to <= 1e6 per from") {
    val df = Seq(
      (1L, 1L, 1L, "a"), (2L, 2L, 1L, "b"), (3L, 3L, 1L, "a"),
      (4L, 4L, 1L, "b"), (5L, 5L, 1L, "c"), (6L, 6L, 1L, "a"),
      (7L, 7L, 1L, "a"))
      .toDF("event_id", "t_us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("t_us")))
    val got = Timeseries.transitionMatrix(df, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(3))).groupBy(_._1)
    // from 'a': a→b, a→b? sequence a b a b c a a → pairs: ab, ba, ab, bc, ca, aa
    // from a: {b:2, a:1} tot 3 → floor(2e6/3)=666666, floor(1e6/3)=333333
    val fromA = got("a").map(_._2).sorted
    assert(fromA === Seq(333333L, 666666L))
    got.foreach { case (f, ps) => assert(ps.map(_._2).sum <= 1000000L, f) }
  }

  test("rollingAnomalies flags exactly the >kσ point, needs minN history") {
    // 12 steady values of 10.00 then a spike of 50.00 then steady:
    // the spike is >3σ above the flat history (σ=0 → any deviation
    // flags); the steady values never flag; rows before minN=10 of
    // history never flag even though early deviations exist
    val vals = Seq.fill(12)(10.0) ++ Seq(50.0) ++ Seq.fill(5)(10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, i.toLong * 1000000L, v) }
      .toDF("event_id", "t_us", "value")
      .withColumn("ts", timestamp_micros(col("t_us")))
      .withColumn("event_type", lit("t"))
    for (parts <- Seq(1, 4)) {
      val got = Timeseries.rollingAnomalies(df.repartition(parts),
          "event_type", "ts", "value", "event_id")
        .collect().map(_.getLong(0)).toSet
      assert(got === Set(12L), s"parts=$parts")
    }
    // steady-but-noisy history: a matching value does not flag
    val noisy = (Seq(9.0, 11.0, 10.0, 9.5, 10.5, 9.0, 11.0, 10.0, 9.5, 10.5, 10.0, 10.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, i.toLong * 1000000L, v) }
      .toDF("event_id", "t_us", "value")
      .withColumn("ts", timestamp_micros(col("t_us")))
      .withColumn("event_type", lit("t"))
    assert(Timeseries.rollingAnomalies(noisy, "event_type", "ts", "value", "event_id")
      .count() === 0L)
  }

  test("ohlcBars: hand-worked bars, deterministic open/close ties, integer volume") {
    // one bar with 3 events (incl. two at the same µs → event_id
    // breaks the tie), one single-event bar
    val e = Seq(
      (1L, 0 * H + 5L, 10L, "view", 3.5),
      (2L, 0 * H + 1L, 10L, "view", 1.25),
      (3L, 0 * H + 1L, 10L, "view", 9.0),  // same ts as id 2: id orders
      (4L, 2 * H, 10L, "view", 7.0))
      .toDF("event_id", "t_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("t_us")))
    for (parts <- Seq(1, 3)) {
      val got = Timeseries.ohlcBars(e.repartition(parts),
          "event_type", "ts", "value", "event_id")
        .collect().map(r => (r.getTimestamp(1).getTime * 1000) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getLong(6), r.getLong(7))).toMap
      // bar 0: open = value at (ts 1, id 2) = 1.25; close = (ts 5, id 1) = 3.5
      assert(got(0L) === ((1.25, 9.0, 1.25, 3.5, 3L, 13750000L)), s"parts=$parts")
      assert(got(2 * H) === ((7.0, 7.0, 7.0, 7.0, 1L, 7000000L)))
    }
  }

  test("ewma: hand-worked floor recursion, per-key isolation, order by (ts, tie)") {
    val e = Seq(
      (1L, 100L, 10L, "view", 1.0),      // x = 1000000
      (2L, 200L, 10L, "view", 2.0),      // y = (30*2e6 + 70*1e6) div 100 = 1300000
      (3L, 300L, 10L, "view", 0.111111), // x = 111111 (floor)
      (4L, 100L, 20L, "view", 5.0))      // other key: series restarts
      .toDF("event_id", "t_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("t_us")))
    for (parts <- Seq(1, 3)) {
      val got = Timeseries.ewma(e.repartition(parts),
          "user_id", "ts", "value", "event_id", alphaPct = 30)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val y2 = (30L * 2000000L + 70L * 1000000L) / 100L
      val y3 = (30L * 111111L + 70L * y2) / 100L
      assert(got((10L, 1L)) === ((1000000L, 1000000L)), s"parts=$parts")
      assert(got((10L, 2L)) === ((2000000L, y2)))
      assert(got((10L, 3L)) === ((111111L, y3)))
      assert(got((20L, 4L)) === ((5000000L, 5000000L)), "independent key")
    }
  }

  test("linearTrend: hand-worked slopes incl. negative, one-hour group yields NULL") {
    // up: y = 100 + 50x cents at hours 0,1,2 (exact slope 50 c/hr →
    // 5000 centi); down: y = 300 − 100x (slope −100 → −10000);
    // flat1h: two events inside one hour → zero denominator
    val e = Seq(
      (1L, 0 * H, 1L, "up", 1.00), (2L, 1 * H, 1L, "up", 1.50),
      (3L, 2 * H, 1L, "up", 2.00),
      (4L, 0 * H, 1L, "down", 3.00), (5L, 1 * H, 1L, "down", 2.00),
      (6L, 0 * H, 1L, "flat1h", 1.00), (7L, 0 * H + 60L * 1000000L, 1L, "flat1h", 9.00))
      .toDF("event_id", "t_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("t_us")))
    for (parts <- Seq(1, 3)) {
      val got = Timeseries.linearTrend(e.repartition(parts),
          "event_type", "ts", "value")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      assert(got("up") === ((3L, 150L, Some(5000L))), s"parts=$parts")
      assert(got("down") === ((2L, 250L, Some(-10000L))))
      assert(got("flat1h") === ((2L, 500L, None)), "one-hour group: no slope")
    }
  }

  test("paretoFrontier: hand-worked skyline, same-x and same-point handling, equal-y excluded") {
    // points (x, y): frontier must be (1,5), (3,2), (7,1).
    // (2,5): same y as the running min -> dominated by (1,5) (strict x).
    // (3,4): same x as (3,2), larger y -> dominated in the x-group.
    // (9,1): y equals running min 1 -> dominated by (7,1).
    // (7,1) appears twice -> one frontier row with n_rows = 2.
    val pts = Seq((1, 5), (2, 5), (3, 2), (3, 4), (7, 1), (7, 1), (9, 1), (8, 3))
      .toDF("x", "y")
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.Timeseries.paretoFrontier(
          pts.repartition(parts), "x", "y")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got === Map((1, 5) -> 1L, (3, 2) -> 1L, (7, 1) -> 2L), s"parts=$parts")
    }
  }

  test("seasonalProfile: hand-worked hourly means and residuals, partition-invariant") {
    // group a, hour 1: values 1.0, 2.0, 4.0 -> x = 1e6, 2e6, 4e6,
    //   mean = 7e6 div 3 = 2333333, sad = |1e6-m|+|2e6-m|+|4e6-m|
    //        = 1333333 + 333333 + 1666667 = 3333333
    // group a, hour 2: single value 3.5 -> mean 3500000, sad 0
    val rows = Seq(
      ("a", "2024-01-01 01:10:00", 1.0),
      ("a", "2024-01-01 01:20:00", 2.0),
      ("a", "2024-01-02 01:30:00", 4.0), // different day, same hour-of-day
      ("a", "2024-01-01 02:00:00", 3.5))
      .toDF("g", "tss", "v").withColumn("ts", col("tss").cast("timestamp"))
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.Timeseries.seasonalProfile(
          rows.repartition(parts), "g", "ts", "v")
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got === Map(
        ("a", 1) -> ((3L, 2333333L, 3333333L)),
        ("a", 2) -> ((1L, 3500000L, 0L))), s"parts=$parts")
    }
  }

  test("seasonalAnomalies: hourly baseline flags the off-profile point, boundary exact") {
    // (g=a, hour 3) across five days: 1.0 ×8 calm + one 9.0 spike.
    //   x: 1e6 ×8, 9e6 → mean = 17e6 div 9 = 1888888
    //   devs: calm 888888, spike 7111112
    //   sad = 8·888888 + 7111112 = 14222216
    //   k=3 rule: dev·9 > 3·14222216 = 42666648
    //     spike: 7111112·9 = 64000008 → FLAGGED
    //     calm:    888888·9 =  7999992 → not flagged
    // (a lone spike among FEW points inflates its own baseline enough
    // to stay unflagged — that robustness is the point of the
    // mean-abs-dev denominator, and why the fixture needs 8 calm rows)
    val rows = (1 to 8).map(i => (i.toLong, "a", s"2024-01-0${(i % 4) + 1} 03:00:00", 1.0)) :+
      ((9L, "a", "2024-01-05 03:30:00", 9.0))
    val df = rows.toDF("event_id", "g", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.Timeseries.seasonalAnomalies(
          df.repartition(parts), "event_id", "g", "ts", "v", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(5)))
      assert(got.toSeq === Seq((9L, 7111112L)), s"parts=$parts: ${got.toSeq}")
    }
  }

  test("cusumChangepoints: hand recursion matches, sustained shift flags where a point spike resets") {
    // group "a": mean of (10,10,10,10,16,16,16,16) = 13.0 exactly.
    // slack 1.0: d = x - 14 in micros. The first four points drive S
    // to 0 (all negative, clamped); the sustained +16 run accumulates
    // +2.0 each: S = 2, 4, 6, 8 -> threshold 5.0 flags exactly the
    // last two points.
    val shift = (0 until 8).map(i =>
      ("a", i.toLong * 1000000L, i.toLong, if (i < 4) 10.0 else 16.0))
    // group "b": one +100 spike in a flat series — S jumps once then
    // DECAYS by |d| per flat point instead of latching, the behavior
    // that distinguishes CUSUM from a running-max alarm.
    val spike = (0 until 8).map(i =>
      ("b", i.toLong * 1000000L, (10 + i).toLong, if (i == 3) 100.0 else 10.0))
    val df = (shift ++ spike)
      .toDF("g", "t_us", "eid", "v")
      .withColumn("ts", timestamp_micros(col("t_us")))
      .repartition(3)
    val got = Timeseries.cusumChangepoints(df, "g", "ts", "eid", "v",
        slackMicro = 1000000L, thresholdMicro = 5000000L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSet
    // exact integer recursion, worked by hand:
    // a: d = +2000000 for each 16 -> S at eids 6,7 = 6000000, 8000000
    assert(got.filter(_._1 == "a") === Set(("a", 6L, 6000000L), ("a", 7L, 8000000L)))
    // b: mean floor((7*10+100)/8)=21.25 -> d(spike)=+77750000 flags
    // once; the following flat points decay S by 12250000 each:
    // 65500000, 53250000, ... still > 5000000 through eid 17 — the
    // DECAY is visible (S strictly falls), unlike a latched point flag
    val bFlags = got.filter(_._1 == "b").toSeq.sortBy(_._2)
    assert(bFlags.map(_._2) === Seq(13L, 14L, 15L, 16L, 17L))
    assert(bFlags.map(_._3) === Seq(77750000L, 65500000L, 53250000L, 41000000L, 28750000L))
    // partition invariance
    val re = Timeseries.cusumChangepoints(df.repartition(7), "g", "ts", "eid", "v",
        slackMicro = 1000000L, thresholdMicro = 5000000L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4))).toSet
    assert(re === got)
  }

  test("holt: hand-computed level/trend recursion, forecast = l + b, partition-invariant") {
    import graft.operators.Timeseries
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 1L, 1.0),
      (1L, "2024-01-01 00:00:02", 2L, 2.0),
      (1L, "2024-01-01 00:00:03", 3L, 3.0))
      .toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    def run(d: org.apache.spark.sql.DataFrame) =
      Timeseries.holt(d, "user_id", "ts", "value", "event_id",
          alphaPct = 30, betaPct = 20)
        .collect().map(r => r.getLong(2) ->
          ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val got = run(df)
    // step1: l=1e6, b=0; step2: l=(30*2e6+70*1e6)/100=1.3e6,
    // b=(20*3e5+80*0)/100=6e4; step3: l=(30*3e6+70*1.36e6)/100=1852000,
    // b=(20*552000+80*60000)/100=158400
    assert(got(1L) === ((1000000L, 0L, 1000000L)))
    assert(got(2L) === ((1300000L, 60000L, 1360000L)))
    assert(got(3L) === ((1852000L, 158400L, 2010400L)))
    assert(run(df.repartition(5)) === got)
  }

  test("sequenceAudit: gaps, duplicates, regressions counted exactly, partition-invariant") {
    import graft.operators.Timeseries
    // seqs in time order: 10, 11, 15 (gap 3), 11 (regression), 16 (no
    // gap: 15 is the running max, 16 = max+1)
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 1L, 10L),
      (1L, "2024-01-01 00:00:02", 2L, 11L),
      (1L, "2024-01-01 00:00:03", 3L, 15L),
      (1L, "2024-01-01 00:00:04", 4L, 11L),
      (1L, "2024-01-01 00:00:05", 5L, 16L))
      .toDF("user_id", "ts_s", "tie_src", "seqv")
      .withColumn("ts", to_timestamp(col("ts_s")))
    def run(d: org.apache.spark.sql.DataFrame) =
      Timeseries.sequenceAudit(d, "user_id", "ts", "seqv", "tie_src")
        .collect().map(r => r.getLong(2) ->
          ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val got = run(df)
    assert(got(1L) === ((1L, 0L, 0L)))
    assert(got(2L) === ((2L, 0L, 0L)))
    assert(got(3L) === ((3L, 3L, 0L)))
    assert(got(4L) === ((4L, 3L, 1L)))
    assert(got(5L) === ((5L, 3L, 1L)))
    assert(run(df.repartition(4)) === got)
  }

  test("containmentPairs catches doc-inside-doc that Jaccard misses") {
    import graft.operators.Dedup
    // B = A verbatim plus a long unrelated tail: containment(A,B)=100%
    // on A's shingle set, Jaccard ≈ |A|/|B| ≈ 0.33 — below a 0.6 bar
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val tail = (1 to 24).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, a), (2L, s"$a $tail"), (3L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, thresholdPct = 90)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(cont.toSeq === Seq((1L, 2L, 100L)))
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.6)
    assert(jac.count() === 0L, "Jaccard must miss the contained doc at 0.6")
  }

  test("editDistancePairs: small in-place edit passes, rewrite fails, non-candidates never compared") {
    import graft.operators.Dedup
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("w10", "wX")),             // one-token edit: tiny distance
      // shares the w1-w5 prefix shingles (candidate) but the rest is
      // rewritten: distance far above 20% of the longer doc
      (3L, ((1 to 5).map(i => s"w$i") ++ (1 to 15).map(i => s"zz$i")).mkString(" ")),
      (4L, "completely different text here now")   // shares no shingle: never a candidate
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text", n = 3, maxDistPct = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    val (_, _, dist) = pairs.head
    assert(dist >= 1L && dist * 100L <= base.length.toLong * 20L)
    // threshold respected: at 0% only exact matches survive
    assert(Dedup.editDistancePairs(docs, "doc_id", "text", n = 3, maxDistPct = 0)
      .count() === 0L)
    // partition-independence
    val p4 = Dedup.editDistancePairs(docs.repartition(4), "doc_id", "text", n = 3, maxDistPct = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p4 === Set((1L, 2L)))
  }
}
