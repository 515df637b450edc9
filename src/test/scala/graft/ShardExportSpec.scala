package graft

import graft.operators.ShardExport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ShardExport contract: assignment is a pure function of (doc, seed),
  * the manifest is invariant to input partitioning, and the on-disk
  * export round-trips to the same manifest the plan predicts — the
  * reproducibility property the manifest exists to audit.
  */
class ShardExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(parts: Int) =
    (1L to 200L).map(i => (i, s"doc $i body ${"w " * (i % 7).toInt}"))
      .toDF("doc_id", "text").repartition(parts)

  test("manifest is partition-invariant and deterministic") {
    val a = ShardExport.manifest(
      ShardExport.shardAssign(docs(1), "doc_id", "text", seed = 17, nShards = 4))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val b = ShardExport.manifest(
      ShardExport.shardAssign(docs(8), "doc_id", "text", seed = 17, nShards = 4))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(a === b)
    assert(a.map(_._1) === Set(0, 1, 2, 3), "every shard populated")
    assert(a.toSeq.map(_._2).sum === 200L, "every doc in exactly one shard")
  }

  test("a different seed reshuffles shard membership") {
    val s17 = ShardExport.shardAssign(docs(1), "doc_id", "text", 17, 4)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s18 = ShardExport.shardAssign(docs(1), "doc_id", "text", 18, 4)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(s17 !== s18)
  }

  test("export round-trips: on-disk manifest equals the planned manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shard_spec").toString
    val fromDisk = ShardExport.exportShards(spark, docs(8), "doc_id", "text",
        seed = 17, nShards = 4, outDir = dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val planned = ShardExport.manifest(
      ShardExport.shardAssign(docs(1), "doc_id", "text", 17, 4))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(fromDisk === planned)
    // layout: one directory per shard
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs === Array("shard=0", "shard=1", "shard=2", "shard=3"))
  }

  test("hopping windows: every event lands in exactly len/slide windows") {
    val ev = (0L until 100L).map(i => (i, i * 600L * 1000000L, "t"))
      .toDF("event_id", "t_us", "event_type")
      .withColumn("ts", timestamp_micros(col("t_us")))
      .withColumn("value", lit(1.0))
    val windowed = graft.streaming.StreamingOps.hoppingCounts(ev, "1 hour", "30 minutes")
    val totalN = windowed.agg(sum("n")).collect().head.getLong(0)
    assert(totalN === 200L, "each of 100 events in exactly 2 windows")
  }
}
