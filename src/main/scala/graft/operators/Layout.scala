package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D95 — physical-layout file-skipping audit: the measurement that
  * tells you whether a table's layout actually serves a predicate
  * workload BEFORE you rely on zone-map pruning at scale. Writers
  * choose between hash-distributed layouts (uniform file sizes, no
  * clustering) and range-clustered layouts (repartitionByRange on the
  * predicate column + sortWithinPartitions — the `OPTIMIZE ... ZORDER/
  * CLUSTER BY` shape); only the second gives a range predicate
  * file-level pruning, and the difference is a number, not an
  * opinion: the fraction of files (and rows) whose [min, max] zone
  * falls wholly outside the predicate.
  *
  * Scale shape at 100 TB: the audit is ONE narrow scan of the
  * predicate column, reduced map-side to |files| fixed-width
  * (file, min, max, count) rows — partial aggregation is perfectly
  * aligned with file boundaries, so the exchange carries one row per
  * (file, task); the verdict aggregate is file-count sized. The
  * layout write itself is one hash or range exchange — the same cost
  * class as any bulk write.
  */
object Layout {

  /** Write the SAME rows under two physical layouts: `hashed/` —
    * repartition(n, hash(keyCol)) (what a key-bucketed or default
    * writer produces: every file spans the full date range) — and
    * `clustered/` — repartitionByRange(n, dateCol, keyCol) +
    * sortWithinPartitions (tight per-file date zones). The key column
    * joins the range keys as a tiebreak so heavy single-date skew
    * still splits across files instead of overflowing one.
    */
  def writeLayouts(df: DataFrame, dateCol: String, keyCol: String,
      nFiles: Int, dir: String): Unit = {
    require(nFiles > 0, s"invalid file count $nFiles")
    df.repartition(nFiles, col(keyCol))
      .write.mode("overwrite").parquet(s"$dir/hashed")
    df.repartitionByRange(nFiles, col(dateCol), col(keyCol))
      .sortWithinPartitions(dateCol, keyCol)
      .write.mode("overwrite").parquet(s"$dir/clustered")
  }

  /** Audit ONE layout directory against a half-open date range
    * [lo, hi): derive each file's zone map (min/max of the predicate
    * column) from the data itself, classify files as skippable
    * (max < lo OR min ≥ hi — the reader never opens them) vs scanned,
    * and reduce to a single (layout, n_files, n_skip, rows_skip,
    * rows_scan) verdict row.
    */
  def pruneAudit(spark: SparkSession, layoutDir: String, layout: String,
      dateCol: String, lo: String, hi: String): DataFrame = {
    val perFile = spark.read.parquet(s"$layoutDir/$layout")
      .select(input_file_name().as("__f"), col(dateCol).as("__d"))
      .groupBy("__f")
      .agg(min("__d").as("__mn"), max("__d").as("__mx"),
        count(lit(1)).as("__n"))
      .withColumn("__skip",
        col("__mx") < to_date(lit(lo)) || col("__mn") >= to_date(lit(hi)))
    perFile.agg(
        lit(layout).as("layout"),
        count(lit(1)).as("n_files"),
        sum(when(col("__skip"), 1L).otherwise(0L)).as("n_skip"),
        sum(when(col("__skip"), col("__n")).otherwise(0L)).as("rows_skip"),
        sum(when(col("__skip"), 0L).otherwise(col("__n"))).as("rows_scan"))
      .select("layout", "n_files", "n_skip", "rows_skip", "rows_scan")
  }

  /** Both layouts' verdicts in one relation, hashed vs clustered. */
  def pruneAuditBoth(spark: SparkSession, layoutDir: String,
      dateCol: String, lo: String, hi: String): DataFrame =
    pruneAudit(spark, layoutDir, "hashed", dateCol, lo, hi)
      .unionAll(pruneAudit(spark, layoutDir, "clustered", dateCol, lo, hi))
}
