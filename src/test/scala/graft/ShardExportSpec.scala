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

  test("rendezvousAssign: minimal movement on resize, mod-N moves most; deterministic") {
    val ids = (1L to 2000L).map(i => Tuple1(i)).toDF("doc_id")
    def assign(n: Int) = ShardExport.rendezvousAssign(ids, "doc_id", seed = 23L, n)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val at8 = assign(8)
    val at9 = assign(9)
    assert(at8.values.toSet.size === 8 && at9.values.toSet.size === 9)
    // HRW growth property: going 8→9 shards, a key moves ONLY if
    // shard 8's new hash beats its old winner — expected 1/9 ≈ 11%,
    // and every mover lands on the NEW shard
    val moved = at8.count { case (id, s) => at9(id) != s }
    assert(moved < 2000 / 9 * 2, s"HRW moved $moved of 2000 (expected ~222)")
    assert(at8.forall { case (id, s) => at9(id) == s || at9(id) == 8 },
      "movers must land on the new shard only")
    // mod-N comparison: the same resize moves the majority of keys
    val mod8 = (1L to 2000L).map(i => i -> (i % 8)).toMap
    val mod9 = (1L to 2000L).map(i => i -> (i % 9)).toMap
    assert(mod8.count { case (id, s) => mod9(id) != s } > 1500,
      "mod-N resize reshuffles most keys - the contrast HRW exists for")
    // pure function of (id, seed): partition layout is irrelevant
    val repart = ShardExport.rendezvousAssign(ids.repartition(7), "doc_id", 23L, 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(repart === at8)
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
