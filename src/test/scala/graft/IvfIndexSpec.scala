package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D7++ — the on-disk IVF index: write partitioned-by-cell, probe with
  * partition pruning. The probe must (a) return the same neighbors as
  * the in-memory IVF at the same probe width, and (b) carry the cell
  * filter as a PARTITION filter, so at 100 TB unprobed cells are never
  * read.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("written index probe equals in-memory IVF; cell filter is a partition filter") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString

    Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 16, dir = dir)
    val fromIndex = Similarity.knnIvfIndexed(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbe = 4)
    val inMemory = Similarity.knnIvf(emb, queries, "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 4)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(key(fromIndex) === key(inMemory))

    // the cell restriction must prune partitions at the file index.
    // The probe plan is AQE-wrapped, so assert on the final plan's
    // string (FileScan ... PartitionFilters: [cell IN (...)])
    val planStr = fromIndex.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [cell"),
      s"cell IN (...) must be a partition filter, plan was:\n$planStr")
    // and on a bare filtered read of the same layout, count the
    // partitions the file index actually selects
    val probed = spark.read.parquet(s"$dir/corpus")
      .filter(col("cell").isin(0, 1, 2, 3))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    assert(selected === 4, s"probe must read only probed cells, read $selected of 16")
  }

  test("full-width probe of the index equals brute force") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_full").toString
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 8, dir = dir)
    val full = Similarity.knnIvfIndexed(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.knnBruteForce(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
  }

  test("append: no retrain, no loss, pruning intact, probe exact over old+new") {
    val emb = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_app").toString
    Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", nLists = 8, dir = dir)
    val centsBefore = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    Similarity.appendIvfIndex(spark, dir, emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding")
    // the quantizer is untouched — append must never retrain
    val centsAfter = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(centsAfter === centsBefore)
    // every row of both halves is in the index exactly once
    val idx = spark.read.parquet(s"$dir/corpus")
    assert(idx.count() === emb.count())
    assert(idx.select(countDistinct(col("cid"))).head().getLong(0) === emb.count())
    // cell layout still bounded by nLists: partition pruning semantics hold
    val cells = idx.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.forall(c => c >= 0 && c < 8), cells.toString)
    // full-width probe over the appended index is still exact
    val queries = emb.filter(col("vec_id") < 5)
    val full = Similarity.knnIvfIndexed(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.knnBruteForce(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
  }
}
