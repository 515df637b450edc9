package graft

import graft.operators.MergeUpsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D52 — the upsert must (1) implement replace-by-key ∪ insert
  * semantics, (2) leave partitions the batch doesn't touch
  * byte-for-byte alone (the partition-pruned rewrite that makes
  * per-epoch cost scale with the batch), and (3) read the base
  * through a PARTITION filter, not a data filter.
  */
class MergeUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft_merge_spec").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"),
      (7L, "g"), (8L, "h"))
      .toDF("id", "v").withColumn("shard", col("id") % 4)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    path
  }

  private def snapshot(path: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
      .toMap
  }

  test("changelog: I/U/D classification, NULL fields, length-prefix collision guard") {
    val before = Seq((1L, Some("a"), Some("x")), (2L, Some("b"), Some("y")),
      (3L, Some("c"), None), (4L, Some("ab"), Some("c")))
      .toDF("id", "f1", "f2")
    val after = Seq((1L, Some("a"), Some("x")),   // unchanged -> no row
      (2L, Some("B"), Some("y")),                 // update
      (4L, Some("a"), Some("bc")),                // "ab"+"c" vs "a"+"bc": MUST be U
      (5L, Some("n"), Some("m")))                 // insert; 3 deleted
      .toDF("id", "f1", "f2")
    for (parts <- Seq(1, 3)) {
      val got = MergeUpsert.changelog(before.repartition(parts), after,
          "id", Seq("f1", "f2"))
        .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
      assert(got === Map(2L -> "U", 3L -> "D", 4L -> "U", 5L -> "I"),
        s"parts=$parts")
    }
    // NULL vs empty-string must differ (length prefix of the cast)
    val b2 = Seq((1L, Option.empty[String])).toDF("id", "f1")
    val a2 = Seq((1L, Some(""))).toDF("id", "f1")
    val n = MergeUpsert.changelog(b2, a2, "id", Seq("f1")).collect()
    // coalesce(NULL,'') == '' -> same hash: NULL and '' intentionally
    // equal (the standard CDC convention for absent vs empty); pin it
    assert(n.isEmpty, "NULL and empty string compare equal by convention")
  }

  test("changelogBothImages: old values on U/D, new values on I/U, NULL elsewhere") {
    val before = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L))
      .toDF("id", "g", "v")
    val after = Seq((1L, "g1", 10L),  // unchanged
      (2L, "g2", 25L),                // update with group move
      (4L, "g3", 40L))                // insert; 3 deleted
      .toDF("id", "g", "v")
    val got = MergeUpsert.changelogBothImages(before, after, "id", Seq("g", "v"))
      .collect().map(r => r.getLong(1) ->
        (r.getString(0),
          Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3)),
          Option(r.getString(4)), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    assert(got === Map(
      2L -> (("U", Some("g1"), Some(20L), Some("g2"), Some(25L))),
      3L -> (("D", Some("g2"), Some(30L), None, None)),
      4L -> (("I", None, None, Some("g3"), Some(40L)))))
  }

  test("maintainGroupSums equals full recompute: moves, deaths, births, value edits") {
    val before = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "c", 40L), (5L, "c", 5L)).toDF("id", "g", "v")
    val after = Seq((1L, "a", 11L),  // value edit in place
      (2L, "b", 20L),                // group move a -> b
      (4L, "c", 40L),                // unchanged
      (5L, "c", 5L),                 // unchanged
      (6L, "d", 60L))                // birth of group d; 3 deleted -> b loses 30
      .toDF("id", "g", "v")
    val baseAgg = before.groupBy("g")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_val"))
    for (parts <- Seq(1, 3)) {
      val got = MergeUpsert.maintainGroupSums(baseAgg,
          before.repartition(parts), after, "id", "g", "v")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val full = after.groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === full, s"parts=$parts")
      assert(got === Map("a" -> ((1L, 11L)), "b" -> ((1L, 20L)),
        "c" -> ((2L, 45L)), "d" -> ((1L, 60L))))
    }
    // a batch that empties a group must drop it from the view entirely
    val afterDead = Seq((6L, "d", 60L)).toDF("id", "g", "v")
    val dead = MergeUpsert.maintainGroupSums(baseAgg, before, afterDead,
      "id", "g", "v").collect().map(_.getString(0)).toSet
    assert(dead === Set("d"))
  }

  test("maintainGroupMinMax: clean merge vs dirty rescan, hand-worked") {
    val before = Seq((1L, "a", 10L), (2L, "a", 50L), (3L, "b", 30L),
      (4L, "b", 70L), (5L, "c", 5L)).toDF("id", "g", "v")
    // a: max (50) retracted by delete -> DIRTY, new max from rescan = 40
    // b: add 90 extends max monotonically, no retraction -> CLEAN
    // c: value edit away from the min (5 -> 8): old 5 WAS min -> DIRTY
    // d: born via insert
    val after = Seq((1L, "a", 10L), (6L, "a", 40L),
      (3L, "b", 30L), (4L, "b", 70L), (7L, "b", 90L),
      (5L, "c", 8L), (8L, "d", 60L)).toDF("id", "g", "v")
    val baseAgg = before.groupBy("g").agg(count(lit(1)).as("n_rows"),
      min("v").as("min_val"), max("v").as("max_val"))
    for (parts <- Seq(1, 3)) {
      val got = MergeUpsert.maintainGroupMinMax(baseAgg,
          before.repartition(parts), after, "id", "g", "v")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val full = after.groupBy("g").agg(count(lit(1)).as("n"),
          min("v").as("mn"), max("v").as("mx"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === full, s"parts=$parts")
      assert(got === Map("a" -> ((2L, 10L, 40L)), "b" -> ((3L, 30L, 90L)),
        "c" -> ((1L, 8L, 8L)), "d" -> ((1L, 60L, 60L))))
    }
    // group death: retract every row of a group -> gone from the view
    val afterDead = Seq((8L, "d", 60L)).toDF("id", "g", "v")
    assert(MergeUpsert.maintainGroupMinMax(baseAgg, before, afterDead,
      "id", "g", "v").collect().map(_.getString(0)).toSet === Set("d"))
  }

  test("upsertWithMaintainedAgg: rollup tracks merges; epoch replay never double-retracts") {
    val work = java.nio.file.Files.createTempDirectory("graft_mua_spec")
    val table = work.resolve("t").toString
    val aggP = work.resolve("a").toString
    val base = Seq((1L, 0L, "a", 10L), (2L, 1L, "a", 20L), (3L, 0L, "b", 30L))
      .toDF("id", "shard", "g", "v")
    base.write.mode("overwrite").partitionBy("shard").parquet(table)
    base.groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_val"))
      .write.mode("overwrite").parquet(aggP)
    // batch: update id=2 with a group move a->b, insert id=4 into c
    val batch = Seq((2L, 1L, "b", 25L), (4L, 1L, "c", 40L))
      .toDF("id", "shard", "g", "v")
    def rollup() = spark.read.parquet(aggP).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    MergeUpsert.upsertWithMaintainedAgg(spark, table, aggP, batch,
      "id", "shard", "g", "v", epochId = 7L)
    val expected = Map("a" -> ((1L, 10L)), "b" -> ((2L, 55L)), "c" -> ((1L, 40L)))
    assert(rollup() === expected)
    // the rollup must equal a full recompute of the merged table
    val full = spark.read.parquet(table).groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rollup() === full)
    // replaying the SAME epoch re-runs only the idempotent merge: the
    // rollup must not double-retract (without the marker, id=2's new
    // row would retract itself and b would read (1, 30))
    MergeUpsert.upsertWithMaintainedAgg(spark, table, aggP, batch,
      "id", "shard", "g", "v", epochId = 7L)
    assert(rollup() === expected, "epoch replay corrupted the rollup")
    // a NEW epoch with the same content applies cleanly (upsert of
    // identical rows: retract+add cancel, rollup unchanged)
    MergeUpsert.upsertWithMaintainedAgg(spark, table, aggP, batch,
      "id", "shard", "g", "v", epochId = 8L)
    assert(rollup() === expected)
    // markers live OUTSIDE aggPath: epoch 8's wholesale rollup publish
    // must not have wiped epoch 7's marker (the replay guard)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${aggP}__applied", "epoch_7")),
      "earlier epoch's marker wiped by a later rollup rewrite")
  }

  test("upsertWithMaintainedAgg: crash recovery from every commit-protocol window") {
    def setup(): (String, String) = {
      val work = java.nio.file.Files.createTempDirectory("graft_mua_crash")
      val table = work.resolve("t").toString
      val aggP = work.resolve("a").toString
      val base = Seq((1L, 0L, "a", 10L), (2L, 1L, "a", 20L), (3L, 0L, "b", 30L))
        .toDF("id", "shard", "g", "v")
      base.write.mode("overwrite").partitionBy("shard").parquet(table)
      base.groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_val"))
        .write.mode("overwrite").parquet(aggP)
      (table, aggP)
    }
    val batch = Seq((2L, 1L, "b", 25L), (4L, 1L, "c", 40L))
      .toDF("id", "shard", "g", "v")
    val expected = Map("a" -> ((1L, 10L)), "b" -> ((2L, 55L)), "c" -> ((1L, 40L)))
    def rollupOf(aggP: String) = spark.read.parquet(aggP).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def tableMatchesRollup(table: String, aggP: String): Unit = {
      val full = spark.read.parquet(table).groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rollupOf(aggP) === full, "rollup desynced from table")
    }
    val sealedRollup = Seq(("a", 1L, 10L), ("b", 2L, 55L), ("c", 1L, 40L))
      .toDF("g", "n_rows", "sum_val")

    // window 1: died after sealing (staging + marker) but BEFORE
    // publish and merge — replay must finish publish then merge
    locally {
      val (table, aggP) = setup()
      sealedRollup.write.parquet(s"${aggP}__staging_epoch_7")
      val m = java.nio.file.Paths.get(s"${aggP}__applied", "epoch_7")
      java.nio.file.Files.createDirectories(m.getParent)
      java.nio.file.Files.createFile(m)
      MergeUpsert.upsertWithMaintainedAgg(spark, table, aggP, batch,
        "id", "shard", "g", "v", epochId = 7L)
      assert(rollupOf(aggP) === expected)
      tableMatchesRollup(table, aggP)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"${aggP}__staging_epoch_7")), "staging not cleaned")
    }

    // window 2: died after publish but BEFORE the merge — replay must
    // keep the sealed rollup (NOT recompute against a pre-merge base
    // it no longer matches) and run only the merge
    locally {
      val (table, aggP) = setup()
      val aggDir = java.nio.file.Paths.get(aggP)
      java.nio.file.Files.walk(aggDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      sealedRollup.write.parquet(aggP)
      val m = java.nio.file.Paths.get(s"${aggP}__applied", "epoch_7")
      java.nio.file.Files.createDirectories(m.getParent)
      java.nio.file.Files.createFile(m)
      MergeUpsert.upsertWithMaintainedAgg(spark, table, aggP, batch,
        "id", "shard", "g", "v", epochId = 7L)
      assert(rollupOf(aggP) === expected)
      tableMatchesRollup(table, aggP)
    }

    // window 3 (the r9 ADVICE lost-update bug shape): with the OLD
    // merge-first ordering, a death between merge and rollup write
    // left a merged table + stale rollup + no marker, and the replay's
    // delta (derived from the post-merge base) cancelled to zero,
    // sealing the stale rollup. The new protocol cannot reach that
    // state — the merge only runs after the marker exists — so an
    // unsealed replay always sees the pre-merge base. Pin that: no
    // marker, no staging, untouched base => clean full application.
    locally {
      val (table, aggP) = setup()
      MergeUpsert.upsertWithMaintainedAgg(spark, table, aggP, batch,
        "id", "shard", "g", "v", epochId = 7L)
      assert(rollupOf(aggP) === expected)
      tableMatchesRollup(table, aggP)
    }
  }

  test("upsertWithMaintainedAgg: commit protocol runs through the path's Hadoop FileSystem") {
    // Explicit file: scheme — the protocol must resolve and use the
    // Hadoop FileSystem for seal/publish/replay (LocalFileSystem here,
    // the RawLocalFileSystem-backed adapter), not java.nio locality.
    // The same resolution hands the protocol to HDFS on hdfs:// paths.
    val work = java.nio.file.Files.createTempDirectory("graft_mua_hfs")
    val table = s"file:${work.resolve("t")}"
    val aggP = s"file:${work.resolve("a")}"
    val base = Seq((1L, 0L, "a", 10L), (2L, 1L, "a", 20L), (3L, 0L, "b", 30L))
      .toDF("id", "shard", "g", "v")
    base.write.mode("overwrite").partitionBy("shard").parquet(table)
    base.groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_val"))
      .write.mode("overwrite").parquet(aggP)
    val batch = Seq((2L, 1L, "b", 25L), (4L, 1L, "c", 40L))
      .toDF("id", "shard", "g", "v")
    val expected = Map("a" -> ((1L, 10L)), "b" -> ((2L, 55L)), "c" -> ((1L, 40L)))
    def rollup() = spark.read.parquet(aggP).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    MergeUpsert.upsertWithMaintainedAgg(spark, table, aggP, batch,
      "id", "shard", "g", "v", epochId = 7L)
    assert(rollup() === expected)
    val hp = new org.apache.hadoop.fs.Path(aggP)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem],
      s"file: path must resolve the RawLocalFileSystem-backed adapter, got ${fs.getClass}")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"${aggP}__applied/epoch_7")),
      "seal marker not visible through the FileSystem API")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${aggP}__staging_epoch_7")),
      "staging not cleaned after publish")
    // replay through the same FileSystem-resolved guard stays exact
    MergeUpsert.upsertWithMaintainedAgg(spark, table, aggP, batch,
      "id", "shard", "g", "v", epochId = 7L)
    assert(rollup() === expected, "epoch replay corrupted the rollup")
  }

  test("replace-by-key plus insert, read back from the committed table") {
    val path = freshTable()
    // update id=5 (shard 1), insert id=9 (shard 1): one affected shard
    val batch = Seq((5L, "E"), (9L, "i")).toDF("id", "v")
      .withColumn("shard", col("id") % 4)
    MergeUpsert.upsertPartitioned(spark, path, batch, "id", "shard")
    val got = spark.read.parquet(path).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d",
      5L -> "E", 6L -> "f", 7L -> "g", 8L -> "h", 9L -> "i"))
  }

  test("partitions the batch does not touch keep their files byte-for-byte") {
    val path = freshTable()
    val before = snapshot(path)
    val batch = Seq((5L, "E")).toDF("id", "v").withColumn("shard", col("id") % 4)
    MergeUpsert.upsertPartitioned(spark, path, batch, "id", "shard")
    val after = snapshot(path)
    val untouched = (f: String) => !f.contains("shard=1")
    assert(before.keySet.filter(untouched) === after.keySet.filter(untouched),
      "untouched shards must keep their exact file set")
    before.filter(kv => untouched(kv._1)).foreach { case (f, meta) =>
      assert(after(f) === meta, s"untouched file rewritten: $f")
    }
    // and the affected shard WAS rewritten
    assert(before.keySet.filter(_.contains("shard=1")) !=
      after.keySet.filter(_.contains("shard=1")))
  }

  test("the base read prunes at the partition level") {
    val path = freshTable()
    val pruned = spark.read.parquet(path).filter(col("shard").isin(1))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    assert(selected === 1, s"expected 1 of 4 partitions read, got $selected")
  }

  test("re-applying the same batch is idempotent (the streaming replay guarantee)") {
    val path = freshTable()
    val batch = Seq((5L, "E"), (9L, "i")).toDF("id", "v")
      .withColumn("shard", col("id") % 4)
    MergeUpsert.upsertPartitioned(spark, path, batch, "id", "shard")
    val once = spark.read.parquet(path).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    MergeUpsert.upsertPartitioned(spark, path, batch, "id", "shard")
    val twice = spark.read.parquet(path).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(twice === once)
  }

  test("an empty batch leaves the table byte-for-byte untouched") {
    val path = freshTable()
    val before = snapshot(path)
    val batch = Seq.empty[(Long, String)].toDF("id", "v")
      .withColumn("shard", col("id") % 4)
    MergeUpsert.upsertPartitioned(spark, path, batch, "id", "shard")
    assert(snapshot(path) === before)
  }

  test("a batch keying every partition still merges correctly") {
    val path = freshTable()
    val batch = Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D"), (10L, "j"))
      .toDF("id", "v").withColumn("shard", col("id") % 4)
    MergeUpsert.upsertPartitioned(spark, path, batch, "id", "shard")
    val got = spark.read.parquet(path).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set(1L -> "A", 2L -> "B", 3L -> "C", 4L -> "D",
      5L -> "e", 6L -> "f", 7L -> "g", 8L -> "h", 10L -> "j"))
  }
}
