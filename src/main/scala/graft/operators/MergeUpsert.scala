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
    // hash-distribute by the partition column before the write (the
    // Iceberg write.distribution-mode=hash discipline, guide §6):
    // without it every task holds rows of EVERY affected partition and
    // the commit lands tasks×partitions small files; with it each
    // affected partition's rows land in one task → one ~partition-sized
    // file (r16: the gate's commit went from ~256 4 KB files to 8).
    val merged = kept.unionByName(batch.select(base.columns.map(col): _*))
      .repartition(col(partCol))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(path)
  }

  /** D79 — changelog derivation (snapshot diff → CDC rows): given two
    * keyed table states, emit the minimal insert/update/delete
    * changeset that turns `before` into `after` — the inverse of the
    * MERGE above, and the bridge from snapshot-based storage to
    * changelog consumers (downstream incremental jobs, cache
    * invalidation, audit). op ∈ I/U/D; U is detected by md5 over the
    * concatenated compare columns (length-prefixed fields so "ab"+"c"
    * never collides with "a"+"bc"; NULL compares equal to '' — the
    * usual CDC absent-vs-empty convention, spec-pinned).
    *
    * Scale shape: ONE key-keyed full outer join of two fixed-width
    * (key, hash) projections — content reduces to md5 BEFORE the
    * shuffle, so the exchange never carries payloads; unchanged rows
    * drop in the post-join filter.
    */
  def changelog(before: DataFrame, after: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "changelog needs compare columns")
    def hashed(df: DataFrame, h: String) = {
      val parts = compareCols.flatMap(c =>
        Seq(length(coalesce(col(c).cast("string"), lit(""))).cast("string"),
          coalesce(col(c).cast("string"), lit(""))))
      df.select(col(keyCol).as("k"), md5(concat(parts: _*).cast("binary")).as(h))
    }
    hashed(before, "hb").join(hashed(after, "ha"), Seq("k"), "full_outer")
      .withColumn("op",
        when(col("hb").isNull, lit("I"))
          .when(col("ha").isNull, lit("D"))
          .when(col("hb") =!= col("ha"), lit("U")))
      .filter(col("op").isNotNull)
      .select(col("op"), col("k").as(keyCol))
  }

  /** D79b — changelog WITH after-images: (op, key) plus the new
    * values of `compareCols` for I/U rows (NULL for D — the key no
    * longer exists). This is what a CDC consumer actually applies;
    * the hash-only [[changelog]] stays the default because ITS
    * exchange never carries payloads, but a consumer re-joining
    * `after` by key would repeat this work downstream anyway.
    *
    * Scale shape: the diff itself is [[changelog]] (fixed-width
    * hash exchange); the value attach then broadcast-semi-prunes
    * `after` to changed keys BEFORE any exchange — change volume is
    * batch-bounded by construction (it cannot exceed |batch| in the
    * MERGE flow), so the broadcast is small and the only exchange of
    * the attach stage carries changed rows, never the table.
    */
  def changelogWithValues(before: DataFrame, after: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    val ops = changelog(before, after, keyCol, compareCols)
      // two consumers below (broadcast prune + final join): compute
      // the double-shuffle diff once
      .localCheckpoint()
    val changedAfter = after
      .join(broadcast(ops.filter(col("op") =!= "D").select(keyCol)),
        Seq(keyCol), "left_semi")
      .select(col(keyCol) +: compareCols.map(col): _*)
    ops.join(changedAfter, Seq(keyCol), "left")
      .select(col("op") +: col(keyCol) +: compareCols.map(col): _*)
  }

  /** D98 (support) — changelog with BOTH images: (op, key,
    * old_<col>…, new_<col>…). D rows carry old values only, I rows
    * new only, U rows both — exactly what incremental view
    * maintenance needs to RETRACT a changed row's old contribution
    * and add its new one. Same scale discipline as
    * [[changelogWithValues]]: the diff itself is hash-only; values
    * attach through TWO broadcast changed-key semi-joins (one per
    * side), so every value-carrying exchange is bounded by change
    * volume, never table size.
    */
  def changelogBothImages(before: DataFrame, after: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    val ops = changelog(before, after, keyCol, compareCols)
      .localCheckpoint() // three consumers: two prunes + final joins
    def side(df: DataFrame, keep: Seq[String], prefix: String) = df
      .join(broadcast(ops.filter(col("op").isin(keep: _*)).select(keyCol)),
        Seq(keyCol), "left_semi")
      .select(col(keyCol) +: compareCols.map(c => col(c).as(s"$prefix$c")): _*)
    ops
      .join(side(before, Seq("U", "D"), "old_"), Seq(keyCol), "left")
      .join(side(after, Seq("I", "U"), "new_"), Seq(keyCol), "left")
      .select(col("op") +: col(keyCol) +:
        (compareCols.map(c => col(s"old_$c")) ++
          compareCols.map(c => col(s"new_$c"))): _*)
  }

  /** D98 — incremental aggregate-view maintenance: update a
    * (group, n_rows, sum) rollup from a snapshot diff WITHOUT
    * re-aggregating the table — the materialized-view half of the CDC
    * bridge (at 100 TB a nightly full GROUP BY over the corpus to
    * refresh a dashboard rollup costs more than every delta of the
    * day combined). Each changed row retracts its old contribution
    * (at its OLD group — group moves handled) and adds its new one;
    * groups whose row count reaches zero drop from the view.
    *
    * `baseAgg` must be the rollup of `before` with columns
    * (groupCol, n_rows, sum_val) — e.g. a previous call's output or
    * one bootstrap aggregation. `valCol` must be integer-typed
    * (fixed-point by convention) so retraction is exact; float sums
    * would drift from the recomputed truth they must equal.
    *
    * Scale shape: the delta aggregate is keyed by GROUP over
    * change-bounded rows; the view merge is one outer join of two
    * dimension-sized tables. Nothing corpus-sized moves.
    */
  /** D98/E37 (batch step) — MERGE a batch into the keyed table AND
    * update its (group, n_rows, sum_val) rollup incrementally, in one
    * epoch. The delta never needs a snapshot diff here: upsert
    * semantics make every batch row an I or U, so the retraction set
    * is exactly the base rows sharing the batch's keys — read behind
    * the SAME partition pruning as the merge itself, keyed down by a
    * broadcast semi-join. The rollup table is dimension-sized; its
    * rewrite is a full (cheap) overwrite.
    *
    * Exactly-once: the table merge is idempotent by construction
    * (replace-by-key), but a replayed delta would double-retract — so
    * delta application is guarded by an atomically-created epoch
    * marker. The commit protocol orders rollup BEFORE merge so no
    * crash window can seal a stale rollup:
    * (1) write the updated rollup (derived from the PRE-merge base)
    *     to a staging dir — freely recomputable while no marker
    *     exists, because the table merge has not run yet;
    * (2) atomically create `<aggPath>__applied/epoch_<id>` — the
    *     commit point sealing this epoch's rollup content;
    * (3) publish staging over `aggPath`;
    * (4) run the idempotent table merge.
    * A replay before (2) recomputes everything against the untouched
    * base; a replay after (2) finishes publish+merge from the SEALED
    * staging instead of recomputing — the delta is never derived from
    * a post-merge base, where retract and add would cancel and a
    * stale rollup would be sealed as current. Markers live BESIDE
    * `aggPath`, not inside it, so the wholesale rollup publish of one
    * epoch can never wipe earlier epochs' markers.
    *
    * The protocol runs through the path's own Hadoop `FileSystem`
    * (resolved per call from `aggPath`'s scheme), so the same code
    * commits on local fs, HDFS, or any store with a `FileSystem`
    * adapter. It leans on exactly two contract guarantees — atomic
    * `createNewFile` (the seal) and atomic directory `rename` (the
    * publish) — both held by HDFS and local fs. Object-store adapters
    * whose rename is copy-based (raw S3A) should front the store with
    * a committer/metastore that restores atomic publish; the seam is
    * this one `FileSystem` resolution, nothing else assumes locality.
    */
  def upsertWithMaintainedAgg(spark: SparkSession, tablePath: String,
      aggPath: String, batch: DataFrame, keyCol: String, partCol: String,
      groupCol: String, valCol: String, epochId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val aggP = new Path(aggPath)
    val fs = aggP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markerDir = new Path(s"${aggPath}__applied")
    val marker = new Path(markerDir, s"epoch_$epochId")
    val staging = new Path(s"${aggPath}__staging_epoch_$epochId")
    def publish(): Unit = {
      if (fs.exists(aggP)) fs.delete(aggP, true)
      require(fs.rename(staging, aggP), s"publish rename $staging -> $aggP failed")
    }
    if (fs.exists(marker)) {
      // Epoch already sealed: finish a publish the sealing run may
      // have died before, then re-run only the idempotent merge.
      if (fs.exists(staging)) publish()
      upsertPartitioned(spark, tablePath, batch, keyCol, partCol)
      return
    }
    val affected = batch.select(partCol).distinct().collect().map(_.get(0))
    if (affected.isEmpty) return
    val keys = batch.select(keyCol)
    val retract = spark.read.parquet(tablePath)
      .filter(col(partCol).isin(affected: _*))
      .join(broadcast(keys), Seq(keyCol), "left_semi")
      .select(col(groupCol), lit(-1L).as("dn"),
        (-col(valCol)).cast("long").as("dv"))
    val add = batch.select(col(groupCol), lit(1L).as("dn"),
      col(valCol).cast("long").as("dv"))
    val delta = retract.unionByName(add).groupBy(groupCol)
      .agg(sum("dn").as("__dn"), sum("dv").as("__dv"))
    val newAgg = spark.read.parquet(aggPath)
      .join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) + coalesce(col("__dv"), lit(0L))).as("sum_val"))
      .filter(col("n_rows") > 0)
    // (1) staging write materializes the pre-merge delta to disk —
    // the base is untouched until step (4), so no checkpoint needed
    if (fs.exists(staging)) fs.delete(staging, true)
    newAgg.write.mode("overwrite").parquet(staging.toString)
    // (2) seal; (3) publish; (4) merge. createNewFile is the
    // FileSystem contract's atomic create-if-absent — a concurrent
    // sealer loses the race and returns false, which is fine: the
    // sealed content is identical (same pre-merge base, same batch).
    fs.mkdirs(markerDir)
    fs.createNewFile(marker)
    publish()
    upsertPartitioned(spark, tablePath, batch, keyCol, partCol)
  }

  /** D98b — incremental MIN/MAX view maintenance. Unlike SUM/COUNT,
    * extrema are NOT retractable: deleting a group's current minimum
    * says nothing about the new minimum without looking at the group
    * again. The classic maintenance split: additions merge
    * monotonically (min/max against the delta — always safe); a group
    * is DIRTY only when a retracted old value EQUALS its current
    * extremum, and only dirty groups rescan — a semi-join-pruned pass
    * over `after` bounded by change volume, not table size (on a
    * group-clustered layout the rescan also directory-prunes). This
    * is why rollup views at scale pair SUM/COUNT (cheap deltas) with
    * rare full extrema refreshes — here the refresh granularity is
    * one group.
    *
    * `baseAgg` columns: (groupCol, n_rows, min_val, max_val) — the
    * rollup of `before`, e.g. a previous call's output.
    */
  def maintainGroupMinMax(baseAgg: DataFrame, before: DataFrame,
      after: DataFrame, keyCol: String, groupCol: String,
      valCol: String): DataFrame = {
    val cl = changelogBothImages(before, after, keyCol, Seq(groupCol, valCol))
      .localCheckpoint() // consumed by adds, retractions, and counts
    val adds = cl.filter(col("op").isin("I", "U"))
      .groupBy(col(s"new_$groupCol").as(groupCol))
      .agg(count(lit(1)).as("__an"), min(s"new_$valCol").as("__amin"),
        max(s"new_$valCol").as("__amax"))
    val retr = cl.filter(col("op").isin("U", "D"))
      .groupBy(col(s"old_$groupCol").as(groupCol))
      .agg(count(lit(1)).as("__rn"), min(s"old_$valCol").as("__rmin"),
        max(s"old_$valCol").as("__rmax"))
    val merged = baseAgg
      .join(adds, Seq(groupCol), "full_outer")
      .join(retr, Seq(groupCol), "full_outer")
      .withColumn("__n", coalesce(col("n_rows"), lit(0L))
        + coalesce(col("__an"), lit(0L)) - coalesce(col("__rn"), lit(0L)))
      // dirty iff a retracted value ties the group's current extremum
      .withColumn("__dirty",
        (col("__rmin") <= col("min_val")) || (col("__rmax") >= col("max_val")))
      .localCheckpoint() // consumed by the clean branch AND the dirty-group prune
    val clean = merged.filter(col("__n") > 0 && !coalesce(col("__dirty"), lit(false)))
      .select(col(groupCol), col("__n").as("n_rows"),
        least(col("min_val"), col("__amin")).as("min_val"),
        greatest(col("max_val"), col("__amax")).as("max_val"))
    val dirtyGroups = merged
      .filter(col("__n") > 0 && coalesce(col("__dirty"), lit(false)))
      .select(groupCol)
    val rescanned = after
      .join(broadcast(dirtyGroups), Seq(groupCol), "left_semi")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"), min(valCol).as("min_val"),
        max(valCol).as("max_val"))
    clean.unionByName(rescanned)
  }

  def maintainGroupSums(baseAgg: DataFrame, before: DataFrame,
      after: DataFrame, keyCol: String, groupCol: String,
      valCol: String): DataFrame = {
    val cl = changelogBothImages(before, after, keyCol, Seq(groupCol, valCol))
    val retract = cl.filter(col("op").isin("U", "D"))
      .select(col(s"old_$groupCol").as(groupCol),
        lit(-1L).as("dn"), (-col(s"old_$valCol")).cast("long").as("dv"))
    val add = cl.filter(col("op").isin("I", "U"))
      .select(col(s"new_$groupCol").as(groupCol),
        lit(1L).as("dn"), col(s"new_$valCol").cast("long").as("dv"))
    val delta = retract.unionByName(add)
      .groupBy(groupCol)
      .agg(sum("dn").as("__dn"), sum("dv").as("__dv"))
    baseAgg
      .join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) + coalesce(col("__dv"), lit(0L))).as("sum_val"))
      .filter(col("n_rows") > 0)
  }
}
