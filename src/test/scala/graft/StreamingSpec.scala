package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{SessionEvent, SessionUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** E3/E4: Structured Streaming results must equal the batch plans —
  * that equivalence is the correctness contract (SURVEY.md §2.E).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("E3: file-source windowed agg with watermark equals batch") {
    import spark.implicits._
    // stage the events table as a parquet dir (micros ts — the
    // Tables loader's nanos conversion applied once at staging)
    val ev = Tables(spark, sf, "events").select("ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("stream_src").toString
    ev.write.mode("overwrite").parquet(dir)

    val q = StreamingOps.fileStreamToMemory(spark, dir, ev.schema, "win_sink")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_sink")
      .select(col("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type").collect()
    val batch = StreamingOps.tumblingCounts(ev)
      .select(col("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("E3b: append mode emits only watermark-finalized windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
    val q = StreamingOps.tumblingCounts(df)
      .writeStream.format("memory").queryName("append_sink")
      .outputMode(OutputMode.Append()).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      input.addData((t("2024-01-01 10:05:00"), "click", 1.0),
        (t("2024-01-01 10:20:00"), "click", 2.0))
      q.processAllAvailable()
      // nothing final yet: watermark = 10:20 - 10m = 10:10 < 11:00
      assert(spark.table("append_sink").count() === 0)
      // event at 12:30 pushes watermark past the 10:00 window
      input.addData((t("2024-01-01 12:30:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("append_sink")
        .select(col("win_start").cast("string"), col("n")).collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet ===
        Set(("2024-01-01 10:00:00", 2L)))
    } finally q.stop()
  }

  test("E3c: parquet file sink with checkpoint survives query restart without dupes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("stream_pq")
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def start(input: MemoryStream[(java.sql.Timestamp, String, Double)]) =
      input.toDF().toDF("ts", "event_type", "value")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("win.start").as("win_start"), col("event_type"), col("n"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val in1 = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q1 = start(in1)
    try {
      in1.addData((t("2024-01-01 09:10:00"), "click", 1.0))
      in1.addData((t("2024-01-01 11:30:00"), "view", 1.0)) // finalizes 09:00
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the checkpoint: the replacement source must replay
    // the already-committed batches (MemoryStream offsets are batch
    // indexes), then continue with new data
    val in2 = MemoryStream[(java.sql.Timestamp, String, Double)]
    in2.addData((t("2024-01-01 09:10:00"), "click", 1.0))
    in2.addData((t("2024-01-01 11:30:00"), "view", 1.0))
    in2.addData((t("2024-01-01 13:30:00"), "view", 1.0)) // finalizes 11:00
    val q2 = start(in2)
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(outDir)
      .select(col("win_start").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("2024-01-01 09:00:00", "click", 1L)))
    // no duplicated window emissions across the restart
    val dupes = spark.read.parquet(outDir)
      .groupBy("win_start", "event_type").count().filter(col("count") > 1).count()
    assert(dupes === 0)
  }

  test("E4: stateful sessionizer equals batch Sessionize across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent].collect().sortBy(_.ts_us)

    val input = MemoryStream[SessionEvent]
    val q = StreamingOps.sessionize(input.toDS(), 1800L)
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      // feed in three time-ordered chunks to exercise cross-trigger state
      val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
      chunks.foreach { c => input.addData(c.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    // last update per user = final session/event counts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    val streamed = spark.table("sess_sink")
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("user_id", "n_sessions", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = graft.operators.Sessionize
      .userSessions(Tables(spark, sf, "events"), "user_id", "ts", 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }
}
