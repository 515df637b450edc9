package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** D53 — small-file compaction for partitioned parquet tables. A
  * continuously-upserted corpus accretes files per epoch (every
  * dynamic-overwrite commit writes at least one file per touched
  * partition); scan cost then grows with FILE COUNT, not data size —
  * at 100 TB a million 1 MB files is a metadata DoS on the driver's
  * file index long before it is an IO problem. Compaction rewrites
  * fragmented partitions content-identically into one file each, so
  * it can run as an online maintenance pass between epochs.
  */
object Compact {

  /** Rewrite every partition of the table at `path` that is
    * fragmented — more than `maxFilesOk` files, or any file smaller
    * than `smallBytes` — into ONE file per partition. Already-compact
    * partitions keep their files byte-for-byte (same dynamic-
    * overwrite discipline as [[MergeUpsert]]: the commit only
    * carries rewritten partitions).
    *
    * Scale shape: the fragmentation census is the file metadata the
    * driver's file index already holds; the rewrite is one narrow
    * read→repartition→write over affected partitions only (directory
    * pruning — untouched data is never opened). The repartition keys
    * on `partCol`, so each partition's rows land in a single task and
    * therefore a single output file; partitions that would outgrow
    * one healthy file belong to the writer's maxRecordsPerFile knob,
    * which splits within the task without another exchange.
    *
    * `clusterCols`: when the table was written range-clustered or
    * Z-ordered (Prep.zorderLayout / Layout.writeLayouts), pass its
    * cluster key so the rewrite re-sorts each rewritten partition
    * (`sortWithinPartitions` — a per-task sort, no extra exchange)
    * instead of interleaving epochs arbitrarily. Without it the first
    * compaction epoch silently destroys the zone-map tightness the
    * D95 audit certified, and every later range scan pays full price.
    * Pair it with `maxRecordsPerFile` (> 0 hands the value to the
    * writer, which splits WITHIN the sorted task — no extra
    * exchange): each split of a sorted run covers a disjoint cluster-
    * key range, so every output file keeps a tight zone map and the
    * audited skip ratio survives the rewrite (CompactSpec proves it
    * with pruneAudit before/after).
    *
    * Returns the number of partitions rewritten.
    */
  def compactPartitions(spark: SparkSession, path: String, partCol: String,
      maxFilesOk: Int = 1, smallBytes: Long = 0L,
      clusterCols: Seq[String] = Nil, maxRecordsPerFile: Long = 0L): Int = {
    val root = new java.io.File(path)
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
    val affected = parts.filter { d =>
      val files = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      files.length > maxFilesOk || files.exists(_.length() < smallBytes)
    }
    if (affected.nonEmpty) {
      val values = affected.map(_.getName.stripPrefix(s"$partCol=")).toSeq
      val slice = spark.read.parquet(path)
        .filter(col(partCol).cast("string").isin(values: _*))
      val placed = slice.repartition(affected.length, col(partCol))
      val ordered =
        if (clusterCols.isEmpty) placed
        else placed.sortWithinPartitions(clusterCols.map(col): _*)
      val writer = ordered
        .localCheckpoint() // the path is both input and overwrite target
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
      (if (maxRecordsPerFile > 0)
         writer.option("maxRecordsPerFile", maxRecordsPerFile)
       else writer)
        .partitionBy(partCol)
        .parquet(path)
    }
    affected.length
  }
}
