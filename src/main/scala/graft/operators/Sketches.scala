package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D57 — persisted mergeable cardinality sketches: per-shard HLL
  * sketches (Spark's Apache DataSketches functions) written once
  * beside the corpus, so "how many distinct X" — overall or for any
  * shard subset — answers from the SKETCH TABLE (one tiny row per
  * shard) instead of a corpus-wide distinct. New shards append
  * without touching old rows: HLL register-max union is associative
  * and order-independent, the same algebra that makes the per-shard
  * aggregate map-side partial at build time.
  *
  * At 100 TB this is the difference between a metadata query and a
  * full-corpus exchange: exact distinct shuffles every key once per
  * question asked; the sketch table answers every subsequent
  * question at the cost of scanning |shards| kilobyte rows, with the
  * standard HLL error bound (~1.6% at the default lgK=12).
  *
  * Determinism caveat (spec-pinned): DataSketches sketch BYTES are
  * insertion-order-sensitive (sparse-mode internals), so estimates
  * from different build orders can differ within the error bound —
  * the contract is the bound, never byte equality. The gate folds
  * the estimate to a tolerance boolean for exactly this reason.
  */
object Sketches {

  /** One HLL sketch row per shard: (shard, n_rows, sketch). */
  def writeCardinalitySketches(docs: DataFrame, keyCol: String,
      shardCol: String, dir: String): Unit =
    docs.groupBy(col(shardCol).as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col(keyCol)).as("sketch"))
      .write.mode("append").parquet(dir)

  /** Distinct-count estimate from the persisted sketches — all
    * shards, or any subset — without touching the corpus.
    */
  def estimateDistinct(spark: SparkSession, dir: String,
      shards: Seq[Long] = Nil): Long = {
    val t = spark.read.parquet(dir)
    val s = if (shards.isEmpty) t else t.filter(col("shard").isin(shards: _*))
    s.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .head().getLong(0)
  }

  /** D65 — persisted mergeable HISTOGRAM sketch for quantile
    * dashboards: one (shard, bin, cnt) row set per shard with
    * fixed-width integer bins, written once beside the corpus. Any
    * later quantile question (p50/p95/p99 doc length — overall or
    * for a shard subset) answers from the sketch table: merge is
    * per-bin SUM (associative, order-independent, append-only — the
    * HLL union algebra with exact integers), so new shards append
    * without touching old rows and NOTHING corpus-sized is ever
    * rescanned. The answer is exact at bin resolution: the bin
    * containing the ceiling-rank element, with [lo, hi) bounds —
    * fully engine-replayable, unlike interpolated float quantiles.
    *
    * 100 TB shape: build = one map-side-partial aggregate to
    * |shards|·|bins| fixed-width rows; query = scan of that tiny
    * table, one window cumsum over |bins| rows, never the corpus.
    */
  /** The (shard, bin, cnt) reduction both the batch writer and the
    * E44 streaming monitor append: one map-side-partial aggregate to
    * |shards|·|bins| fixed-width rows.
    */
  def histogramShardRows(docs: DataFrame, valueCol: String,
      shardCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"invalid binWidth $binWidth")
    docs.select(col(shardCol).as("shard"),
        expr(s"CAST($valueCol AS BIGINT) div $binWidth").as("bin"))
      .groupBy("shard", "bin").agg(count(lit(1)).as("cnt"))
  }

  def writeHistogramSketch(docs: DataFrame, valueCol: String,
      shardCol: String, dir: String, binWidth: Long): Unit =
    histogramShardRows(docs, valueCol, shardCol, binWidth)
      .write.mode("append").parquet(dir)

  /** Quantile bins from the persisted sketch (all shards or a
    * subset): for each pct, the bin holding the ceiling-rank element
    * — rank = ⌈pct·total/100⌉, smallest bin with running cum ≥ rank.
    */
  def quantilesFromSketch(spark: SparkSession, dir: String, binWidth: Long,
      percentiles: Seq[Int], shards: Seq[Long] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val t = spark.read.parquet(dir)
    val sel = if (shards.isEmpty) t else t.filter(col("shard").isin(shards: _*))
    val merged = sel.groupBy("bin").agg(sum("cnt").as("cnt"))
    // running cum AND the grand total from the SAME window sort — the
    // sketch table is scanned exactly once (a separate total aggregate
    // would re-scan it per consumer)
    // unpartitioned by design: input = one row per histogram bin
    // (binWidth-bounded), pinned by PlanSpec "bounded prefix windows"
    val w = Window.orderBy("bin")
    val cum = merged.select(col("bin"),
      sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"),
      sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("total"))
    val pcts = percentiles.map(_.toLong).toDF("pct")
    broadcast(pcts)
      .join(cum, col("cum") >= expr("(pct * total + 99) div 100"))
      .groupBy("pct").agg(min("bin").as("bin"), min("total").as("total"))
      .select(col("pct"), col("bin"),
        (col("bin") * binWidth).as("lo"),
        ((col("bin") + 1) * binWidth).as("hi"),
        col("total"))
  }

  /** The gate surface: exact distinct (oracle-replayable) plus the
    * sketch-path estimate folded to a contract boolean — a drifting
    * estimate flips the boolean and breaks the row hash, without
    * ever asking the oracle to reproduce HLL internals.
    */
  def cardinalityCheck(docs: DataFrame, keyCol: String, shardCol: String,
      dir: String, tolerancePct: Int = 5): DataFrame = {
    writeCardinalitySketches(docs, keyCol, shardCol, dir)
    val est = estimateDistinct(docs.sparkSession, dir)
    docs.agg(countDistinct(col(keyCol)).as("n_exact"))
      .withColumn("estimate_ok",
        abs(lit(est) - col("n_exact")) * 100 <= col("n_exact") * tolerancePct)
  }
}
