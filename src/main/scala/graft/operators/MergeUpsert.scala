package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D52 — keyed MERGE (upsert) into a partitioned parquet table with
  * partition-pruned rewrite: batch rows replace base rows that share
  * their key, new keys append, and ONLY partitions the batch touches
  * are read or rewritten. This is the maintenance primitive of a
  * continuously-curated corpus — per-epoch cost scales with the
  * batch's partition spread, never the table.
  *
  * Contract: `partCol` must be a pure function of `keyCol` (e.g. a
  * hash shard), so a key's partition is stable and replacing it never
  * requires looking outside its own partition.
  */
object MergeUpsert {

  /** Upsert `batch` into the parquet table at `path` (partitioned by
    * `partCol` directories). Scale shape, in order:
    * (1) affected-partition list = one distinct on the batch —
    * bounded by the partition count, the only driver-resident state;
    * (2) the base read carries `partCol IN (affected)`, which prunes
    * at the DIRECTORY level (a partition filter, not a data filter) —
    * untouched partitions are never opened;
    * (3) the anti-join keying out replaced rows shuffles only
    * affected-partition rows against batch keys;
    * (4) dynamic partition overwrite commits exactly the partitions
    * present in the merged frame — untouched directories keep their
    * files byte-for-byte.
    * The localCheckpoint materializes the merged slice (bounded by
    * the batch's partition spread) because a path cannot be
    * overwritten while a live plan still reads it.
    */
  def upsertPartitioned(spark: SparkSession, path: String, batch: DataFrame,
      keyCol: String, partCol: String): Unit = {
    val affected = batch.select(partCol).distinct().collect().map(_.get(0))
    if (affected.isEmpty) return // empty batch: zero partitions to touch
    val base = spark.read.parquet(path)
      .filter(col(partCol).isin(affected: _*))
    val kept = base.join(batch.select(keyCol), Seq(keyCol), "left_anti")
    val merged = kept.unionByName(batch.select(base.columns.map(col): _*))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(path)
  }
}
