package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * All reads go through here so filters/projections written by query
  * code sit directly on the parquet scan and Catalyst can push them.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables whose downstream per-row work is CPU-heavy (shingling,
    * hashing, vector math). For these a narrow scan is worth widening
    * with a shuffle; for cheap scans/aggregates the shuffle costs more
    * than the single-task stage it parallelizes.
    */
  private val computeHeavy = Set("documents", "embeddings")

  /** Loaded-table cache: file listing + schema read + (for
    * compute-heavy tables) the partition probe run once per
    * (session, dir, table) instead of once per query. DataFrames are
    * immutable plans, so reuse across queries is free.
    */
  // Keyed by session IDENTITY (an IdentityHashMap resolves two live
  // sessions with colliding identityHashCodes correctly, unlike a
  // hash-of-identity key). A weak key would be a no-op here — cached
  // DataFrames strongly reference their session, which would pin the
  // key — so eviction is explicit instead: entries whose context has
  // stopped are purged on every access.
  private val cache = new java.util.IdentityHashMap[
    SparkSession, scala.collection.mutable.Map[(String, String), DataFrame]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      cache.entrySet().removeIf(e => e.getKey.sparkContext.isStopped)
      var m = cache.get(spark)
      if (m == null) { m = scala.collection.mutable.Map(); cache.put(spark, m) }
      m
    }
    perSession.synchronized {
      perSession.getOrElseUpdate((dir, name), {
        val df =
          if (name == "events") events(spark, dir)
          else spark.read.parquet(s"$dir/$name.parquet")
        if (computeHeavy(name)) fanOut(df) else df
      })
    }
  }

  /** Register every testdata table as a temp view so `spark.sql(...)`
    * has the full relational surface over them (mirrors
    * HeapSql.register for heap exports).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** The testdata files are single-row-group parquet, so every scan
    * stage is ONE task no matter the split config — pinning all
    * per-row work to one core. Fan out when the scan is narrower than
    * the cluster; filters/projections still push below the exchange,
    * so only pruned+filtered rows shuffle, and decimal/exact-agg
    * oracle rules (SURVEY §6) make results order-independent. On a
    * real multi-row-group/multi-file layout this is a no-op.
    *
    * Public since r16: gates whose per-row work is CPU-heavy on a
    * NON-compute-heavy table (BigDecimal moment aggregates, per-row
    * md5 ranks over lineitem) apply it at the call site — blanket
    * fanning lineitem would tax the many gates where the scan is the
    * cheap part (guide §2.3: the shuffle must buy back more than it
    * costs).
    */
  def fanOut(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }

  /** events.ts has shipped as TWO physical types across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as raw longs and truncate to micros with
    * integral `div`, not `/`: double division loses precision above
    * 2^53 ns ≈ 1970+104 days) and plain timestamp[us] (which Spark
    * reads as TIMESTAMP_NTZ). Normalize BY SCHEMA so either vintage
    * loads as session-zoned TIMESTAMP with identical micro values:
    * DuckDB reads both as naive micros, and with the session zone
    * pinned to UTC (Verify/Bench builders) the NTZ→TIMESTAMP cast is
    * wall-clock-preserving, so oracles agree either way.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }
}
