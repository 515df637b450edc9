package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.SessionEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** E7/E8 + state-store backends: streaming dedup within a watermark,
  * stream-stream interval join (vs the identical batch join), and the
  * stateful sessionizer on the RocksDB state store.
  */
class Streaming2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("E44: per-batch sketch shards compose — streamed quantiles == one-shot batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (shard, value)
    val df = input.toDF().toDF("shard", "v")
    val work = java.nio.file.Files.createTempDirectory("hist_stream")
    val sk = work.resolve("sk").toString
    val q = StreamingOps.histogramSketchStream(df, "v", "shard", sk,
      binWidth = 10L, work.resolve("ckpt").toString)
    val b1 = (1L to 40L).map(i => (i % 4, i))
    val b2 = (41L to 100L).map(i => (i % 4, i))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // two epoch dirs landed
    val epochs = new java.io.File(sk).listFiles().map(_.getName).filter(_.startsWith("epoch_"))
    assert(epochs.length === 2, epochs.toSeq)
    val streamed = graft.operators.Sketches
      .quantilesFromSketchDirs(spark,
        graft.streaming.StreamingOps.epochDirs(spark, sk), 10L, Seq(50, 90, 99))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    // one-shot batch sketch over the same 100 values
    val batchDir = work.resolve("batch_sk").toString
    graft.operators.Sketches.writeHistogramSketch(
      (b1 ++ b2).toDF("shard", "v"), "v", "shard", batchDir, 10L)
    val oneShot = graft.operators.Sketches
      .quantilesFromSketch(spark, batchDir, 10L, Seq(50, 90, 99))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(streamed === oneShot)
    // hand check: 100 values 1..100, p50 rank 50 -> value 50 -> bin 5
    assert(streamed(50L) === ((5L, 100L)))
    assert(streamed(99L) === ((9L, 100L)))
  }

  test("E45: span guard probes then appends — batch 2 sees batch 1, not vice versa") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("span_guard")
    val idx = work.resolve("idx").toString
    graft.operators.Dedup.writeGramIndex(
      Seq((0L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text", n = 3, idx)
    val input = MemoryStream[(Long, String)]
    val out = work.resolve("out").toString
    val q = StreamingOps.spanGuardStream(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, out, work.resolve("ckpt").toString)
    try {
      // batch 1: doc 1 hits the seed ("a b c"); doc 3's "p q r" is NOVEL
      input.addData((1L, "x a b c y"), (3L, "p q r s"))
      q.processAllAvailable()
      // batch 2: doc 5 duplicates BATCH 1's "p q r" — must flag now
      input.addData((5L, "z p q r w"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$out/spans/batch_*").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(4)))).toMap
    assert(got(1L) === ((1L, 1)), "seed-index hit in batch 1")
    assert(got(3L) === ((0L, -1)), "novel in batch 1: silent, then appended")
    assert(got(5L) === ((1L, 1)), "batch 2 flags a span known only from batch 1")
  }

  test("E7: dropDuplicatesWithinWatermark drops re-arrivals, state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("event_id", "ts")
    val q = StreamingOps.dedupStream(df, "event_id", "ts", "30 minutes")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // same ids re-arrive within the horizon → dropped
      input.addData((1L, t("2024-01-01 10:05:00")), (2L, t("2024-01-01 10:06:00")),
        (3L, t("2024-01-01 10:07:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted === Seq(1L, 2L, 3L))
      assert(ids.distinct.length === ids.length)
    } finally q.stop()
  }

  test("E8: stream-stream interval join equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val errors = MemoryStream[(Long, Long, java.sql.Timestamp)]
    def toEv(ms: MemoryStream[(Long, Long, java.sql.Timestamp)]) =
      ms.toDF().toDF("event_id", "user_id", "ts")
    val q = StreamingOps.clickErrorJoin(toEv(clicks), toEv(errors), 30)
      .writeStream.format("memory").queryName("join_sink")
      .outputMode(OutputMode.Append()).start()
    val clickRows = Seq(
      (100L, 1L, t("2024-01-01 10:00:00")),
      (101L, 1L, t("2024-01-01 11:00:00")),
      (102L, 2L, t("2024-01-01 10:10:00")))
    val errorRows = Seq(
      (200L, 1L, t("2024-01-01 09:45:00")), // within 30m of click 100
      (201L, 1L, t("2024-01-01 10:50:00")), // within 30m of click 101
      (202L, 2L, t("2024-01-01 09:00:00")), // too old for click 102
      (203L, 3L, t("2024-01-01 10:00:00"))) // no clicks for user 3
    try {
      clicks.addData(clickRows: _*)
      errors.addData(errorRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("join_sink")
        .select("click_id", "error_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = StreamingOps.clickErrorJoin(
          clickRows.toDF("event_id", "user_id", "ts"),
          errorRows.toDF("event_id", "user_id", "ts"), 30)
        .select("click_id", "error_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(streamed === Set((100L, 200L), (101L, 201L)))
    } finally q.stop()
  }

  test("E26: streaming anomaly ring state crosses micro-batches; judged before push") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.AnomEvent]
    val q = StreamingOps.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("anom_sink")
      .outputMode(OutputMode.Append()).start()
    def ev(i: Long, x: Long) = StreamingOps.AnomEvent(i, "t", i * 1000000L, x)
    try {
      // batch 1: 12 steady values — no flags (d = n·x − S = 0)
      input.addData((1L to 12L).map(i => ev(i, 1000L)): _*)
      q.processAllAvailable()
      // batch 2: the ring must carry over; spike at 16 flags against
      // σ=0 history (n=15), the post-spike steady values must NOT flag
      // (the spike inflates the window variance)
      input.addData(Seq(ev(13L, 1000L), ev(14L, 1000L), ev(15L, 1000L),
        ev(16L, 5000L), ev(17L, 1000L), ev(18L, 1000L)): _*)
      q.processAllAvailable()
      val hits = spark.table("anom_sink").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSeq
      assert(hits === Seq((16L, 15L)))
    } finally q.stop()
  }

  test("E39 stream: CUSUM state crosses micro-batches, decays, and matches the hand recursion") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.CusumEvent]
    // target 10, slack 1 (micros): d = x - 11
    val q = StreamingOps.cusumStream(input.toDS(), Map("t" -> 10000000L),
        slackMicro = 1000000L, thresholdMicro = 5000000L)
      .writeStream.format("memory").queryName("cusum_sink")
      .outputMode(OutputMode.Append()).start()
    def ev(i: Long, x: Long) = StreamingOps.CusumEvent(i, "t", i * 1000000L, x * 1000000L)
    try {
      // batch 1: four 13s accumulate +2 each -> S = 2,4,6,8; alarms at
      // the last two (S > 5)
      input.addData((1L to 4L).map(i => ev(i, 13L)): _*)
      q.processAllAvailable()
      // batch 2: S=8 must CARRY OVER; one more 13 -> 10 (alarm), then
      // two 10s decay by 1 each -> 9, 8 (still alarming: decay visible,
      // not a reset), then a 1 drops S to 0 (clamped) -> quiet
      input.addData(Seq(ev(5L, 13L), ev(6L, 10L), ev(7L, 10L), ev(8L, 1L)): _*)
      q.processAllAvailable()
      val hits = spark.table("cusum_sink").collect()
        .map(r => (r.getLong(2), r.getLong(4))).sortBy(_._1)
      assert(hits.toSeq === Seq((3L, 6000000L), (4L, 8000000L),
        (5L, 10000000L), (6L, 9000000L), (7L, 8000000L)))
    } finally q.stop()
  }

  test("E39/E42 stream in-order contract: cross-batch regressions flag, in-order never does") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // cusum: batch 2 replays an event time before batch 1's max
    val cin = MemoryStream[StreamingOps.CusumEvent]
    val cq = StreamingOps.cusumStream(cin.toDS(), Map("t" -> 10000000L),
        slackMicro = 1000000L, thresholdMicro = 500000000L)
      .writeStream.format("memory").queryName("cusum_late_sink")
      .outputMode(OutputMode.Append()).start()
    def cev(i: Long, t: Long) = StreamingOps.CusumEvent(i, "t", t, 11000000L)
    try {
      cin.addData(cev(1L, 1000000L), cev(2L, 5000000L))
      cq.processAllAvailable()
      // in-order batch: no marker
      cin.addData(cev(3L, 6000000L))
      cq.processAllAvailable()
      assert(spark.table("cusum_late_sink")
        .filter(col("cusum_micro") === StreamingOps.LATE_MARKER).count() === 0L)
      // two events BEFORE the max seen (6s): one marker row, count 2,
      // earliest late ts carried
      cin.addData(cev(4L, 2000000L), cev(5L, 3000000L), cev(6L, 7000000L))
      cq.processAllAvailable()
      val markers = spark.table("cusum_late_sink")
        .filter(col("cusum_micro") === StreamingOps.LATE_MARKER).collect()
      assert(markers.length === 1)
      assert(markers.head.getAs[Long]("x_micro") === 2L)
      assert(markers.head.getAs[Long]("t_us") === 2000000L)
    } finally cq.stop()
    // funnel: in-order feeding never emits a marker even across many batches
    val fin = MemoryStream[StreamingOps.FunnelEvent]
    val fq = StreamingOps.funnelStream(fin.toDS())
      .writeStream.format("memory").queryName("funnel_late_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      fin.addData(StreamingOps.FunnelEvent(1L, "view", 1L, 1L))
      fq.processAllAvailable()
      fin.addData(StreamingOps.FunnelEvent(1L, "click", 2L, 2L))
      fq.processAllAvailable()
      fin.addData(StreamingOps.FunnelEvent(1L, "purchase", 3L, 3L))
      fq.processAllAvailable()
      val rows = spark.table("funnel_late_sink").collect().map(_.getString(1))
      assert(!rows.contains("late_arrival"))
      assert(rows.sorted.toSeq === Seq("click", "purchase", "view"))
    } finally fq.stop()
  }

  test("E52/E53 stream: EWMA and as-of state carry across batches; late markers fire") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // EWMA: y carries across batches; alpha=30
    val ein = MemoryStream[StreamingOps.EwmaEvent]
    val eq = StreamingOps.ewmaStream(ein.toDS(), alphaPct = 30)
      .writeStream.format("memory").queryName("ewma_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      ein.addData(StreamingOps.EwmaEvent(1L, 1L, 1L, 1000000L),
        StreamingOps.EwmaEvent(1L, 2L, 2L, 2000000L))
      eq.processAllAvailable()
      // batch 2 continues the recursion from y=1300000
      ein.addData(StreamingOps.EwmaEvent(1L, 3L, 3L, 3000000L))
      eq.processAllAvailable()
      // late arrival in batch 3 -> marker
      ein.addData(StreamingOps.EwmaEvent(1L, 1L, 9L, 500000L))
      eq.processAllAvailable()
      val rows = spark.table("ewma_sink").collect()
        .map(r => (r.getLong(2), r.getLong(4))).toMap // tie -> ewma
      assert(rows(1L) === 1000000L)                    // first = x
      assert(rows(2L) === (30L * 2000000L + 70L * 1000000L) / 100) // 1300000
      assert(rows(3L) === (30L * 3000000L + 70L * 1300000L) / 100) // 1810000
      assert(rows(-1L) === StreamingOps.LATE_MARKER)   // marker row, count 1
      // the marker's identity is STRUCTURAL (a real EWMA of -1 is
      // attainable when x_micro goes negative): exactly the marker row
      // carries the flag
      val flagged = spark.table("ewma_sink").collect()
        .map(r => (r.getLong(2), r.getBoolean(5))).toMap
      assert(flagged(-1L) === true)
      assert(Seq(1L, 2L, 3L).forall(flagged(_) === false))
    } finally eq.stop()
    // Holt: level+trend recursion carries across batches; alpha=30 beta=20
    val hin = MemoryStream[StreamingOps.EwmaEvent]
    val hq = StreamingOps.holtStream(hin.toDS(), alphaPct = 30, betaPct = 20)
      .writeStream.format("memory").queryName("holt_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      hin.addData(StreamingOps.EwmaEvent(1L, 1L, 1L, 1000000L),
        StreamingOps.EwmaEvent(1L, 2L, 2L, 2000000L))
      hq.processAllAvailable()
      hin.addData(StreamingOps.EwmaEvent(1L, 3L, 3L, 3000000L))
      hq.processAllAvailable()
      // late arrival -> structural marker
      hin.addData(StreamingOps.EwmaEvent(1L, 1L, 9L, 500000L))
      hq.processAllAvailable()
      val hr = spark.table("holt_sink").collect()
        .map(r => (r.getLong(2), (r.getLong(4), r.getLong(5), r.getBoolean(7)))).toMap
      // step 1: l=x, b=0; step 2: l=(30*2e6+70*1e6)/100=1.3e6,
      // b=(20*(1.3e6-1e6)+80*0)/100=60000; step 3:
      // l=(30*3e6+70*(1.36e6))/100=1852000, b=(20*552000+80*60000)/100=158400
      assert(hr(1L) === ((1000000L, 0L, false)))
      assert(hr(2L) === ((1300000L, 60000L, false)))
      assert(hr(3L) === ((1852000L, 158400L, false)))
      assert(hr(-1L)._3 === true) // marker row, structurally flagged
    } finally hq.stop()
    // sequence audit: gap / duplicate / regression counters carry
    val sin = MemoryStream[StreamingOps.SeqEvent]
    val sq = StreamingOps.seqAuditStream(sin.toDS())
      .writeStream.format("memory").queryName("seqaudit_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      sin.addData(StreamingOps.SeqEvent(1L, 1L, 1L, 10L),
        StreamingOps.SeqEvent(1L, 2L, 2L, 11L))
      sq.processAllAvailable()
      // batch 2: gap of 3 (12,13,14 missing), then a duplicate of 11
      sin.addData(StreamingOps.SeqEvent(1L, 3L, 3L, 15L),
        StreamingOps.SeqEvent(1L, 4L, 4L, 11L))
      sq.processAllAvailable()
      val sr = spark.table("seqaudit_sink").collect()
        .map(r => (r.getLong(2), (r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      assert(sr(1L) === ((1L, 0L, 0L)))
      assert(sr(2L) === ((2L, 0L, 0L)))
      assert(sr(3L) === ((3L, 3L, 0L))) // 12-14 missing ahead of 15
      assert(sr(4L) === ((4L, 3L, 1L))) // 11 again: regression, no new gap
    } finally sq.stop()
    // as-of: latest right carries across batches; equal-ts right wins
    val ain = MemoryStream[StreamingOps.AsofEvent]
    val aq = StreamingOps.asofStream(ain.toDS())
      .writeStream.format("memory").queryName("asof_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      ain.addData(StreamingOps.AsofEvent(1L, true, 10L, 1L, 5.0),
        StreamingOps.AsofEvent(1L, false, 10L, 2L, 0.0), // equal-ts: right first
        StreamingOps.AsofEvent(1L, false, 5L, 3L, 0.0))  // before any right
      aq.processAllAvailable()
      ain.addData(StreamingOps.AsofEvent(1L, false, 20L, 4L, 0.0)) // uses batch-1 right
      aq.processAllAvailable()
      val rows = spark.table("asof_sink").collect()
        .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
      assert(rows(2L) === ((Some(5.0), Some(10L)))) // inclusive equal-ts match
      assert(rows(3L) === ((None, None)))           // no right yet
      assert(rows(4L) === ((Some(5.0), Some(10L)))) // state carried
    } finally aq.stop()
  }

  test("E54 stream: windowed top-k emits once per closed window with deterministic ties") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val winUs = 10000000L
    val evs = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 second")
      .select(col("event_type"),
        (expr(s"unix_micros(ts) div ${winUs}L") * winUs).as("w_start_us"),
        col("ts"))
      .as[StreamingOps.DriftEvent]
    val q = StreamingOps.topkStream(evs, k = 2, winUs)
      .writeStream.format("memory").queryName("topk_sink")
      .outputMode(OutputMode.Append()).start()
    def ev(us: Long, t: String) = (new java.sql.Timestamp(us / 1000L), t)
    try {
      // window 0: a=2, b=2 (tie -> a first), c=1; only top-2 emit
      input.addData(ev(1000000L, "a"), ev(2000000L, "a"),
        ev(3000000L, "b"), ev(4000000L, "b"), ev(5000000L, "c"))
      q.processAllAvailable()
      input.addData(ev(1000000000000L, "z")) // advance the watermark
      q.processAllAvailable()
      val rows = spark.table("topk_sink").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2))
      assert(rows.toSeq === Seq((0L, 1, "a", 2L), (0L, 2, "b", 2L)))
    } finally q.stop()
  }

  test("E41 stream: drift windows emit once on watermark close with the hand L1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val winUs = 10000000L // 10 s windows
    val ref = Map("a" -> 600000L, "b" -> 400000L)
    val evs = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 second")
      .select(col("event_type"),
        (expr(s"unix_micros(ts) div ${winUs}L") * winUs).as("w_start_us"),
        col("ts"))
      .as[StreamingOps.DriftEvent]
    val q = StreamingOps.driftStream(evs, ref, winUs)
      .writeStream.format("memory").queryName("drift_sink")
      .outputMode(OutputMode.Append()).start()
    def ev(us: Long, t: String) =
      (new java.sql.Timestamp(us / 1000L), t)
    try {
      // window 0: 3 a + 1 b -> ppm (750000, 250000), L1 = 150000+150000
      // window 10s: 1 a + 1 b -> ppm (500000, 500000), L1 = 100000+100000
      input.addData(ev(1000000L, "a"), ev(2000000L, "a"), ev(3000000L, "a"),
        ev(4000000L, "b"), ev(11000000L, "a"), ev(12000000L, "b"))
      q.processAllAvailable()
      // far-future row pushes the watermark past both windows
      input.addData(ev(1000000000000L, "a"))
      q.processAllAvailable()
      val rows = spark.table("drift_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(rows.toSeq === Seq((0L, 4L, 300000L), (10000000L, 2L, 200000L)))
    } finally q.stop()
  }

  test("E42 stream: funnel fixpoint resolves equal-ts chains; state carries across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.FunnelEvent]
    val q = StreamingOps.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode(OutputMode.Append()).start()
    def ev(id: Long, t: Long, tpe: String) = StreamingOps.FunnelEvent(1L, tpe, t, id)
    try {
      // click sorts BEFORE the equal-timestamp view (lower id); the
      // fixpoint's second pass must still accept it as the first
      // click >= t_view, exactly like the batch MIN filter
      input.addData(ev(1L, 3L, "click"), ev(2L, 3L, "view"))
      q.processAllAvailable()
      // purchase@2 predates t_click=3 -> must NOT advance; purchase@7 does,
      // and carries t_view from the PREVIOUS batch's state. purchase@2
      // also arrives AFTER batch 1's max event time (3) — a cross-batch
      // time regression, so the in-order contract emits one
      // late_arrival marker row (count 1, earliest late ts 2).
      input.addData(ev(3L, 2L, "purchase"), ev(4L, 7L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("funnel_sink").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._2, x._1))
      assert(rows.toSeq === Seq(("late_arrival", 1L, 2L),
        ("click", 3L, 3L), ("view", 3L, 3L), ("purchase", 7L, 3L)))
    } finally q.stop()
  }

  test("E43 stream: decontamination flags per batch equal the batch operator; batch dirs isolated") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val work = java.nio.file.Files.createTempDirectory("decon_spec")
    val outDir = work.resolve("out").toString
    val q = StreamingOps.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
      shingleN = 3, outDir, work.resolve("ckpt").toString)
    try {
      input.addData((1L, "a b c d e"), (2L, "x y z w v"))
      q.processAllAvailable()
      input.addData((3L, "q q c d e q q"))
      q.processAllAvailable()
      val flagged = spark.read.parquet(s"$outDir/flagged/batch_*")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // doc 1 shares all 3 shingles, doc 3 exactly one ("c d e"),
      // doc 2 none -> absent
      assert(flagged === Map(1L -> 3L, 3L -> 1L))
      // one directory per micro-batch: a replay overwrites its own
      val dirs = new java.io.File(s"$outDir/flagged").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(dirs.length === 2 && dirs.forall(_.startsWith("batch_")), dirs.toSeq)
    } finally q.stop()
  }

  test("RocksDB state store backs the stateful sessionizer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[SessionEvent]
      val q = StreamingOps.sessionize(input.toDS(), 1800L)
        .writeStream.format("memory").queryName("rocks_sink")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(SessionEvent(1L, 0L), SessionEvent(1L, 60L * 1000000L))
        q.processAllAvailable()
        // second trigger: state for user 1 must survive in RocksDB
        input.addData(SessionEvent(1L, 4000L * 1000000L)) // > 30 min gap
        q.processAllAvailable()
        val last = spark.table("rocks_sink")
          .orderBy(col("n_events").desc).limit(1)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
        assert(last === ((1L, 2L, 3L))) // 2 sessions, 3 events
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
