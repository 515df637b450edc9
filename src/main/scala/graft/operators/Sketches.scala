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
