package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D55 — persisted inverted text index with partition-pruned search:
  * the text-retrieval analogue of the on-disk IVF index (D7+). The
  * corpus is tokenized ONCE at build time into a postings table
  * partitioned by term bucket; a query then opens only the buckets
  * its terms hash to — a directory-pruning partition filter, zero
  * corpus rescan, zero corpus shuffle. Without the index, every BM25
  * query re-reads and re-tokenizes the whole corpus (Relevance.bm25's
  * one-shot shape); with it, per-query cost scales with the matched
  * postings.
  *
  * Scale shape: the build is one (doc, term) aggregate — the same
  * single real shuffle as one-shot BM25 — plus a bucket-keyed write;
  * buckets spread terms uniformly (xxhash64), so partition skew is
  * bounded by the hottest single term's postings. Corpus scalars
  * (t_total, n_docs) and the bucket modulus persist beside the
  * postings: readers MUST hash with the same modulus, so it travels
  * with the index, not the caller.
  */
object TextIndex {

  private def hadoopFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Finish (or discard) a stats swap a previous append/compact died
    * inside. The swap is stats -> stats_old, stats_next -> stats,
    * drop stats_old; a crash at any point leaves a state this
    * repairs: a COMPLETE stats_next is always the post-commit row
    * (both writers produce it AFTER their postings commit), so it is
    * republished; an incomplete one is dropped; a leftover stats_old
    * is restored only when stats itself is missing.
    */
  private def recoverStatsSwap(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    val stats = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val next = new org.apache.hadoop.fs.Path(s"$dir/stats_next")
    val old = new org.apache.hadoop.fs.Path(s"$dir/stats_old")
    if (fs.exists(next)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(next, "_SUCCESS"))) {
        if (fs.exists(stats)) fs.delete(stats, true)
        require(fs.rename(next, stats), s"stats publish rename $next -> $stats failed")
      } else fs.delete(next, true)
    }
    if (fs.exists(old)) {
      if (fs.exists(stats)) fs.delete(old, true)
      else require(fs.rename(old, stats), s"stats restore rename $old -> $stats failed")
    }
  }

  // repair-on-read mutates, so recovery serializes per index dir
  // within the JVM (two concurrent searches must not race each
  // other's exists→rename pairs); cross-process maintenance is
  // single-writer by the family contract
  private val dirLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def dirLock(dir: String): Object =
    dirLocks.computeIfAbsent(dir, _ => new Object)

  /** PROBE-side repair: fix only the states a reader CANNOT SERVE —
    * live postings missing with a complete staging (republish), stats
    * missing (republish a complete stats_next, else restore
    * stats_old). Never deletes or displaces anything that exists: an
    * incomplete staging or stats_next may be an in-flight
    * maintainer's write in ANOTHER PROCESS (no shared lock), and a
    * PRESENT stats row beside a complete stats_next is readable —
    * slightly stale until the next writer repairs, which beats a
    * reader racing a live publishStats into a rename failure.
    * Rollback and the stale-stats repair are [[recover]],
    * writer-only.
    */
  private def repairForRead(spark: SparkSession, dir: String): Unit = {
    // postings: the family-shared missing-live republish
    graft.operators.CellCommit.repairMissingLive(spark, s"$dir/postings")
    dirLock(dir).synchronized {
      val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(dir))
      val stats = new org.apache.hadoop.fs.Path(s"$dir/stats")
      val next = new org.apache.hadoop.fs.Path(s"$dir/stats_next")
      val old = new org.apache.hadoop.fs.Path(s"$dir/stats_old")
      if (!fs.exists(stats)) {
        if (fs.exists(new org.apache.hadoop.fs.Path(next, "_SUCCESS")))
          require(fs.rename(next, stats), s"stats publish rename $next -> $stats failed")
        else if (fs.exists(old))
          require(fs.rename(old, stats), s"stats restore rename $old -> $stats failed")
      }
    }
  }

  /** WRITER-side: run both recoveries, including discarding
    * incomplete residue (safe — maintenance is single-writer by the
    * family contract, so incomplete staging/stats_next can only be
    * crash residue). The index is guaranteed readable and writable
    * after this returns, whatever state a crash left.
    */
  private def recover(spark: SparkSession, dir: String): Unit = {
    graft.operators.CellCommit.recoverStagedPublish(spark, s"$dir/postings")
    dirLock(dir).synchronized {
      recoverStatsSwap(hadoopFs(spark, new org.apache.hadoop.fs.Path(dir)), dir)
    }
  }

  /** Publish a new one-row stats table: write to stats_next, swap in
    * by rename. Every intermediate state is repaired by
    * [[recoverStatsSwap]].
    */
  private def publishStats(spark: SparkSession, dir: String, row: DataFrame): Unit = {
    row.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats_next")
    // renames under the dir lock: an in-JVM probe's stats repair must
    // not interleave with the swap (it would consume stats_next first)
    dirLock(dir).synchronized {
      val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(dir))
      val stats = new org.apache.hadoop.fs.Path(s"$dir/stats")
      val next = new org.apache.hadoop.fs.Path(s"$dir/stats_next")
      val old = new org.apache.hadoop.fs.Path(s"$dir/stats_old")
      if (fs.exists(old)) fs.delete(old, true)
      // a concurrent probe's repair may have already published the
      // completed stats_next (its content is this row) — done then
      if (!fs.exists(next)) return
      require(fs.rename(stats, old), s"stats swap rename $stats -> $old failed")
      if (!fs.rename(next, stats)) {
        // a reader in ANOTHER process (no shared lock) can race the
        // swap: between rename(stats, old) and here it sees stats
        // missing, and its repairForRead republishes stats_next — OUR
        // row — into the stats slot. The publish already happened, so
        // a lost rename with next gone and stats present is success,
        // not failure; anything else is a real error.
        require(!fs.exists(next) && fs.exists(stats),
          s"stats publish rename $next -> $stats failed")
      }
      fs.delete(old, true)
    }
  }

  /** Tokenize once, aggregate (doc, term) frequencies, write postings
    * partitioned by `bucket = pmod(xxhash64(w), nBuckets)` plus the
    * one-row stats table the scorer needs.
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String, nBuckets: Int = 64): Unit =
    // maintenance is single-writer per index — enforced by the
    // cross-process lease since round 15, not just documented
    CellCommit.withMaintenanceLease(docs.sparkSession, dir) {
    // a REBUILD discards every maintenance leftover of a previous
    // index in this dir: a stale COMPLETE postings__staging would be
    // republished over the fresh postings by the next recover(), and
    // stale tombstones would mask the new corpus' doc ids
    locally {
      val spark = docs.sparkSession
      graft.operators.CellCommit.clearStagedFlat(spark, s"$dir/postings")
      dirLocks.computeIfAbsent(dir, _ => new Object).synchronized {
        val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(dir))
        Seq("stats_next", "stats_old", "tombstones").foreach { leftover =>
          val p = new org.apache.hadoop.fs.Path(s"$dir/$leftover")
          if (fs.exists(p)) fs.delete(p, true)
        }
      }
    }
    val tf = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ws"))
      .withColumn("len", size(col("ws")).cast("long"))
      .select(col("doc_id"), col("len"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "len", "w").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("w")), lit(nBuckets)).cast("int"))
    tf.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    docs.select(size(TextFunctions.tokens(col(textCol))).cast("long").as("l"))
      .agg(sum("l").as("t_total"), count(lit(1)).as("n_docs"))
      .withColumn("n_buckets", lit(nBuckets))
      .withColumn("gen", lit(0L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Compaction generation of the stats row (0 for an index written
    * before the column existed). Tombstone rows are stamped with the
    * generation they were removed AGAINST; a tombstone whose gen is
    * BELOW the stats gen has already been folded by a compact that
    * crashed before its tombstone drop — it must not be subtracted
    * again (and a fresh compact has nothing to fold from it). The
    * gen comparison makes the probe-side correction order-independent
    * across every crash window in compactIndex, at zero scan cost —
    * no postings-presence probe needed.
    */
  private def statsGen(statsRow: org.apache.spark.sql.Row,
      schema: org.apache.spark.sql.types.StructType): Long =
    if (schema.fieldNames.contains("gen"))
      statsRow.getLong(schema.fieldIndex("gen"))
    else 0L

  private def readStatsGen(spark: SparkSession, dir: String): Long = {
    val df = spark.read.parquet(s"$dir/stats")
    statsGen(df.head(), df.schema)
  }

  /** Pending tombstones AT the given stats generation — stale rows
    * (gen below the stats gen: already folded by a crashed compact)
    * are excluded. Returns None when nothing is pending. Reads with
    * mergeSchema and coalesces a null gen to 0, because a table
    * written before the gen column existed can legally receive
    * gen-stamped appends — a single-footer read of such a MIXED table
    * could otherwise drop whichever vintage's rows the footer lacks.
    */
  private def pendingTombstones(spark: SparkSession, dir: String,
      gen: Long): Option[DataFrame] = {
    val tombP = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (!hadoopFs(spark, tombP).exists(tombP)) return None
    val t = spark.read.option("mergeSchema", "true").parquet(tombP.toString)
    val live =
      if (t.schema.fieldNames.contains("gen"))
        t.filter(coalesce(col("gen"), lit(0L)) === gen)
      else if (gen == 0L) t else t.limit(0)
    if (live.isEmpty) None else Some(live.select("doc_id", "len"))
  }

  private def pendingTombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    pendingTombstones(spark, dir, readStatsGen(spark, dir))

  /** Incremental maintenance: index a NEW batch against the stored
    * bucket modulus and append its postings into the same partition
    * layout — no rebuild, no rewrite of existing postings; cost
    * scales with the batch, not the corpus (the IVF-append contract,
    * D7+). The stats row is replaced with the summed scalars
    * (atomically: written to a temp dir first, moved last), because
    * BM25's idf/avgdl must describe the WHOLE corpus after append.
    */
  def appendIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit =
      CellCommit.withMaintenanceLease(docs.sparkSession, dir) {
    val spark = docs.sparkSession
    // a compact that crashed mid-publish must be finished BEFORE this
    // append writes into live: otherwise the next compact's recovery
    // would republish the pre-append staging over live and silently
    // drop this batch
    recover(spark, dir)
    // ids with a pending delete are refused (the index-family delete
    // contract): their old postings are still physically present, so
    // un-tombstoning on re-add would resurrect stale rows — compact
    // first, then re-append. STALE tombstones (already folded by a
    // crashed compact) don't block: their postings are gone.
    // ONE stats read serves the gen, the refusal probe, and the
    // scalar carry-forward (three separate one-row jobs before)
    val statsDf = spark.read.parquet(s"$dir/stats")
    val statsRow = statsDf.head()
    val gen = statsGen(statsRow, statsDf.schema)
    pendingTombstones(spark, dir, gen).foreach { t =>
      val hit = docs.select(col(idCol).as("doc_id")).distinct()
        .join(t.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
        .limit(5).collect().map(_.get(0)).toSeq
      require(hit.isEmpty,
        s"appendIndex: doc ids ${hit.mkString(", ")} have a pending delete in " +
          s"$dir; compact the index before re-adding them")
    }
    def statLong(name: String): Long = statsRow.getLong(statsDf.schema.fieldIndex(name))
    val nBuckets = statsRow.getInt(statsDf.schema.fieldIndex("n_buckets"))
    val tf = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ws"))
      .withColumn("len", size(col("ws")).cast("long"))
      .select(col("doc_id"), col("len"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "len", "w").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("w")), lit(nBuckets)).cast("int"))
    tf.repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
    val batchStats = docs
      .select(size(TextFunctions.tokens(col(textCol))).cast("long").as("l"))
      .agg(sum("l").as("bt"), count(lit(1)).as("bn")).head()
    publishStats(spark, dir, spark.range(1).select(
      lit(statLong("t_total") + batchStats.getLong(0)).as("t_total"),
      lit(statLong("n_docs") + batchStats.getLong(1)).as("n_docs"),
      lit(nBuckets).as("n_buckets"),
      lit(gen).as("gen"))) // append does not fold tombstones — gen unchanged
  }

  /** DELETE maintenance (the index family's round-13 "out" story, the
    * D52-D54 discipline applied to the inverted index): the removed
    * ids land in a `tombstones` side table as (doc_id, len) rows —
    * the length is recovered FROM the postings, so the probe can
    * derive survivor-exact corpus scalars (BM25's idf/avgdl must
    * describe the post-delete corpus) without rescanning anything.
    * One coalesced parquet append is the commit point; probes
    * anti-join postings against the (broadcast, delete-sized)
    * tombstone set and subtract its sums from the stats row.
    * [[compactIndex]] folds tombstones into a physical rewrite.
    * Idempotent: re-removing an id, or removing one absent from the
    * index, contributes nothing.
    */
  def removeDocs(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String): Unit =
      CellCommit.withMaintenanceLease(spark, dir) {
    recover(spark, dir)
    val tomb = s"$dir/tombstones"
    val tombP = new org.apache.hadoop.fs.Path(tomb)
    val fs = tombP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = readStatsGen(spark, dir)
    val pending = pendingTombstones(spark, dir, gen)
    // a tombstone table with NO pending rows is stale residue of a
    // compact that crashed after its fold — drop it, or its rows
    // would wrongly suppress a re-delete of a re-appended doc
    if (pending.isEmpty && fs.exists(tombP)) fs.delete(tombP, true)
    // (doc_id, len) of ids actually in the index — column-pruned scan
    val present = spark.read.parquet(s"$dir/postings")
      .select("doc_id", "len").distinct()
      .join(broadcast(ids.select(col(idCol).as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
    val novel = pending match {
      case Some(t) =>
        present.join(t.select("doc_id"), Seq("doc_id"), "left_anti").localCheckpoint()
      case None => present
    }
    novel.withColumn("gen", lit(gen))
      .coalesce(1).write.mode("append").parquet(tomb)
  }

  /** Fold pending tombstones into the physical layout: postings are
    * rewritten minus tombstoned docs (staged beside the live dir,
    * swapped by atomic rename), the stats row is RECOMPUTED from the
    * surviving postings (idempotent — a crash-rerun can never
    * double-subtract), and the tombstone table is dropped last (a
    * crash before the drop leaves no-op tombstones the next compact
    * clears).
    */
  def compactIndex(spark: SparkSession, dir: String): Unit =
      CellCommit.withMaintenanceLease(spark, dir) {
    // finish a crashed predecessor FIRST: a complete staging is
    // republished (never discarded — it may hold the only copy of
    // the postings if the crash hit between delete(live) and rename)
    recover(spark, dir)
    val tombP = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = tombP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombP)) return
    val gen = readStatsGen(spark, dir)
    val pending = pendingTombstones(spark, dir, gen)
    if (pending.isEmpty) { fs.delete(tombP, true); return } // stale residue: already folded
    val live = new org.apache.hadoop.fs.Path(s"$dir/postings")
    val staging = new org.apache.hadoop.fs.Path(s"$dir/postings__staging")
    val survivors = spark.read.parquet(live.toString)
      .join(broadcast(pending.get.select("doc_id").distinct()),
        Seq("doc_id"), "left_anti")
    survivors.repartition(col("bucket"))
      .write.mode("errorifexists").partitionBy("bucket").parquet(staging.toString)
    // family-shared commit (same per-live-path lock as the probe
    // repair; staging verified present BEFORE live is deleted)
    graft.operators.CellCommit.publishStaged(spark, s"$dir/postings")
    val nBuckets = spark.read.parquet(s"$dir/stats").select("n_buckets").head().getInt(0)
    // gen+1 marks the fold: from this publish on, the still-present
    // tombstones read as STALE (gen below stats gen), so a crash
    // before the drop below can never double-subtract them
    publishStats(spark, dir, spark.read.parquet(live.toString)
      .select("doc_id", "len").distinct()
      .agg(sum("len").as("t_total"), count(lit(1)).as("n_docs"))
      .withColumn("n_buckets", lit(nBuckets))
      .select(coalesce(col("t_total"), lit(0L)).as("t_total"),
        col("n_docs"), col("n_buckets"), lit(gen + 1L).as("gen")))
    fs.delete(tombP, true)
  }

  /** Query through the persisted index. Integer-exact BM25 saturation
    * (the same formula as Relevance.bm25SaturationExact, so an
    * indexed search must equal the from-scratch score bit-for-bit —
    * which is exactly what the gate pins). Only the buckets the query
    * terms hash to are read; the term buckets are resolved by the
    * engine's own xxhash64 in one single-row job, so build and probe
    * can never disagree on routing.
    */
  def searchSaturationExact(spark: SparkSession, dir: String,
      terms: Seq[String], scale: Long = 1000000L): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    repairForRead(spark, dir)
    // ONE stats read serves the modulus and the gen (was two one-row
    // jobs plus pendingTombstones' own third)
    val stats = spark.read.parquet(s"$dir/stats")
    val statsRow = stats.head()
    val nBuckets = statsRow.getInt(stats.schema.fieldIndex("n_buckets"))
    val bucketRow = spark.range(1).select(
      terms.zipWithIndex.map { case (t, i) =>
        pmod(xxhash64(lit(t)), lit(nBuckets)).cast("int").as(s"b$i") }: _*)
      .head()
    val buckets = terms.indices.map(bucketRow.getInt).distinct
    // pending deletes: postings anti-join the tombstone ids, and the
    // corpus scalars subtract the tombstones' recorded (len, count) —
    // the score is then EXACTLY the from-scratch BM25 over survivors.
    // Only tombstones at the CURRENT stats generation count: a
    // compact that crashed after its stats swap but before its
    // tombstone drop leaves survivor-exact stats with already-folded
    // tombstones (their gen is below the new stats gen), and
    // subtracting those again would silently skew idf/avgdl until the
    // next compact. The gen comparison makes the correction
    // order-independent across every compact crash window, at zero
    // extra scan cost.
    val pending = pendingTombstones(spark, dir, statsGen(statsRow, stats.schema))
    val statsEff = pending match {
      case None => stats.select("t_total", "n_docs")
      case Some(t) =>
        stats.select("t_total", "n_docs")
          .crossJoin(t.agg(coalesce(sum("len"), lit(0L)).as("__dt"),
            count(lit(1)).as("__dn")))
          .select((col("t_total") - col("__dt")).as("t_total"),
            (col("n_docs") - col("__dn")).as("n_docs"))
    }
    val matched = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*) && col("w").isin(terms: _*))
    val livePostings = pending match {
      case None => matched
      case Some(t) =>
        matched.join(broadcast(t.select("doc_id").distinct()), Seq("doc_id"), "left_anti")
    }
    livePostings
      .crossJoin(broadcast(statsEff))
      .withColumn("sat", expr(
        s"($scale * 22 * tf * t_total) DIV (10 * t_total * tf + 3 * t_total + 9 * len * n_docs)"))
      .groupBy("doc_id", "len")
      .agg(count(lit(1)).as("n_matched"), sum("sat").as("sat_score"))
      .select(col("doc_id"), col("len").as("n_tokens"),
        col("n_matched"), col("sat_score"))
  }
}
