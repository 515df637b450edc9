package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the storage-level answer to the
  * biggest 100 TB cost in this engine: a fact-fact equi-join's
  * shuffle. Writing both sides `bucketBy(n, key).sortBy(key)` fixes
  * each row's bucket by `hash(key) % n` AT WRITE TIME; a later join on
  * that key then planwise needs NO Exchange on either side — the
  * SortMergeJoin zips co-located bucket files directly. (Spark 3+
  * still inserts a bucket-LOCAL Sort — scans don't advertise sort
  * order unless `spark.sql.legacy.bucketedTableScan.outputOrdering`
  * is set — but that sort is per-bucket in-memory work; the network
  * shuffle is what the layout eliminates, and `sortBy` still clusters
  * parquet pages for min/max skipping.) One write-side shuffle is paid
  * once; every subsequent join of the table pair is shuffle-free,
  * which is the right trade for fact tables joined repeatedly
  * (orders⨝lineitem every query, corpus⨝candidates every dedup run).
  *
  * Spark only tracks bucketing through the catalog, so these are
  * `saveAsTable` tables (warehouse-backed), not bare parquet paths.
  * BucketingSpec asserts the no-Exchange/no-Sort plan shape.
  */
object Bucketing {

  /** Persist `df` bucketed+sorted on `key` as catalog table `table`.
    * The pre-write `repartition(buckets, key)` uses the same hash as
    * the bucketing itself, so every bucket lands in exactly ONE file —
    * which is what lets the read side trust the sort order (Spark
    * re-sorts multi-file buckets) AND avoids the small-files explosion
    * of tasks×buckets outputs.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two identically-bucketed tables on their bucket key —
    * plans with zero Exchange when both sides have the same bucket
    * count. (A mismatched count silently falls back to shuffling one
    * side; keep bucket counts aligned across co-joined tables.)
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
