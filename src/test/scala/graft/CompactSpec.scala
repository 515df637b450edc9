package graft

import graft.operators.Compact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D53 — compaction must change the LAYOUT (fragmented partitions →
  * one file each) and nothing else: content identical, already-
  * compact partitions byte-for-byte untouched.
  */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parquetFiles(path: String, shard: String): Array[java.io.File] =
    new java.io.File(s"$path/shard=$shard").listFiles()
      .filter(_.getName.endsWith(".parquet"))

  test("fragmented partitions compact to one file each, content identical") {
    val path = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    val df = (0L until 200L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn("shard", col("id") % 4)
    df.repartition(10).write.mode("overwrite").partitionBy("shard").parquet(path)
    assert(parquetFiles(path, "0").length > 1, "fixture must be fragmented")
    val before = spark.read.parquet(path).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rewritten = Compact.compactPartitions(spark, path, "shard")
    assert(rewritten === 4)
    for (sh <- Seq("0", "1", "2", "3"))
      assert(parquetFiles(path, sh).length === 1, s"shard $sh")
    val after = spark.read.parquet(path).select("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after === before)
  }

  test("already-compact partitions keep their files byte-for-byte") {
    val path = java.nio.file.Files.createTempDirectory("graft_compact_spec2").toString
    // shard 0 compact (1 file), shard 1 fragmented
    (0L until 50L).map(i => (i * 2, s"a$i")).toDF("id", "v")
      .withColumn("shard", lit(0L)).coalesce(1)
      .write.mode("append").partitionBy("shard").parquet(path)
    (0L until 50L).map(i => (i * 2 + 1, s"b$i")).toDF("id", "v")
      .withColumn("shard", lit(1L)).repartition(8)
      .write.mode("append").partitionBy("shard").parquet(path)
    assert(parquetFiles(path, "1").length > 1)
    val before0 = parquetFiles(path, "0")
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    val rewritten = Compact.compactPartitions(spark, path, "shard")
    assert(rewritten === 1, "only the fragmented shard is rewritten")
    assert(parquetFiles(path, "0")
      .map(f => (f.getName, f.length(), f.lastModified())).toSet === before0)
    assert(parquetFiles(path, "1").length === 1)
  }

  test("clusterCols + maxRecordsPerFile: compaction preserves zone-map skipping") {
    val path = java.nio.file.Files.createTempDirectory("graft_compact_spec4").toString
    // a date-clustered table: 400 rows over 40 days in one shard,
    // written as 8 fragmented cluster-sorted files (2 epochs of 4)
    val rows = (0L until 400L).map(i => (i, java.sql.Date.valueOf(
      java.time.LocalDate.of(1997, 1, 1).plusDays(i % 40))))
    for (epoch <- 0 to 1) {
      rows.filter(_._1 % 2 == epoch).toDF("id", "d")
        .withColumn("shard", lit(0L))
        .repartitionByRange(4, col("d")).sortWithinPartitions("d")
        .write.mode("append").partitionBy("shard").parquet(path)
    }
    assert(parquetFiles(path, "0").length === 8)
    def skipRatio(): Double = {
      val perFile = spark.read.parquet(path)
        .select(input_file_name().as("f"), col("d"))
        .groupBy("f").agg(min("d").as("mn"), max("d").as("mx"))
        .withColumn("skip", col("mx") < lit("1997-01-11").cast("date") ||
          col("mn") >= lit("1997-01-21").cast("date"))
        .collect()
      perFile.count(_.getAs[Boolean]("skip")).toDouble / perFile.length
    }
    val before = skipRatio()
    assert(before >= 0.5, s"fixture must skip most files, got $before")
    val rewritten = Compact.compactPartitions(spark, path, "shard",
      clusterCols = Seq("d"), maxRecordsPerFile = 100L)
    assert(rewritten === 1)
    val files = parquetFiles(path, "0")
    assert(files.length === 4, s"400 rows / 100 per file, got ${files.length}")
    // each split of the sorted run covers a disjoint date range, so
    // the 10-day predicate still skips at least half the files
    val after = skipRatio()
    assert(after >= 0.5, s"skip ratio must survive compaction, got $after")
    assert(spark.read.parquet(path).count() === 400L)
  }

  test("a fully compact table is a no-op") {
    val path = java.nio.file.Files.createTempDirectory("graft_compact_spec3").toString
    (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v")
      .withColumn("shard", col("id") % 2).repartition(2, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val before = (0 to 1).flatMap(sh => parquetFiles(path, sh.toString)
      .map(f => (f.getName, f.length(), f.lastModified()))).toSet
    assert(Compact.compactPartitions(spark, path, "shard") === 0)
    val after = (0 to 1).flatMap(sh => parquetFiles(path, sh.toString)
      .map(f => (f.getName, f.length(), f.lastModified()))).toSet
    assert(after === before)
  }
}
