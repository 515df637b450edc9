package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** E15 — continuous corpus curation: a document stream is
  * incrementally exact-deduped against the persisted corpus (hash
  * index only) and survivors appended, batch-stamped so replays are
  * idempotent. The streaming counterpart of Dedup.incremental.
  */
class StreamingCurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stream batches dedupe against the growing corpus; first-wins survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_stream")
    val corpusDir = dir.resolve("corpus").toString
    val ckpt = dir.resolve("ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.curateStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", corpusDir, ckpt)
    try {
      // batch 0: one intra-batch duplicate (11 vs 10)
      input.addData((10L, "alpha beta"), (11L, "alpha beta"), (12L, "gamma"))
      q.processAllAvailable()
      // batch 1: 20 duplicates corpus content, 21 is fresh, 22/23 dup each other
      input.addData((20L, "alpha beta"), (21L, "delta"), (22L, "eps"), (23L, "eps"))
      q.processAllAvailable()
    } finally q.stop()

    val docs = spark.read.parquet(s"$corpusDir/docs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(docs === Seq(10L, 12L, 21L, 22L))
    // hash index matches the surviving content exactly
    val nHashes = spark.read.parquet(s"$corpusDir/hashes")
      .select("content_hash").distinct().count()
    assert(nHashes === 4)

    // a NEW query over the same corpus (fresh checkpoint = replayed
    // world) still dedupes against persisted state
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingOps.curateStream(
      input2.toDF().toDF("doc_id", "text"), "doc_id", "text",
      corpusDir, dir.resolve("ckpt2").toString)
    try {
      input2.addData((30L, "gamma"), (31L, "zeta"))
      q2.processAllAvailable()
    } finally q2.stop()
    val docs2 = spark.read.parquet(s"$corpusDir/docs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(docs2 === Seq(10L, 12L, 21L, 22L, 31L))
  }
}
