package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crash-atomic touched-cell rewrite for cell-partitioned index
  * tables (the IVF `corpus` and IVF-PQ `codes` layouts): the staged-
  * publish discipline the rest of the persisted-index family already
  * uses (Dedup.recoverBloomPublish, TextIndex.compactIndex), applied
  * to a PARTIAL rewrite that must still only touch the deleted ids'
  * cell directories.
  *
  * Before this, the delete committed per cell via dynamic partition
  * overwrite — a crash mid-commit left some cells rewritten and some
  * not, with no marker or repair path (round-13 verdict, "What's
  * missing" #1). The protocol:
  *
  *   1. survivors of the touched cells land in `<table>__delta`
  *      (cell-partitioned; Spark's _SUCCESS marks completeness);
  *   2. a one-file `<table>__commit` journal records every touched
  *      cell and whether the delete EMPTIED it (an emptied cell has
  *      no delta directory, so the journal is what distinguishes
  *      "drop this cell" from "already applied" on replay); the
  *      journal's own _SUCCESS is the COMMIT POINT;
  *   3. each touched cell is applied by delete(live cell) +
  *      rename(delta cell, live cell) — idempotent per cell;
  *   4. journal then delta are dropped.
  *
  * [[recover]] makes every intermediate state safe: a complete
  * journal is re-applied to the end (readers then see the NEW index);
  * anything short of a complete journal is rolled back (readers see
  * the OLD index, bit-for-bit). Probes and appends call it before
  * touching the table, so a reader can never observe a mix and an
  * append can never be rolled back by a later repair.
  *
  * Scale shape: unchanged from the dynamic-overwrite version — one
  * column-pruned (cid, cell) scan to find touched cells, one
  * survivor write of ONLY those cells, per-cell renames. Untouched
  * cell directories are never read, written, or renamed.
  */
private[graft] object CellCommit {

  private def hadoopFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  // repair-on-read means PROBES mutate: two concurrent probes of the
  // same table must not race each other's exists→rename pairs, so
  // recovery/apply serialize per table dir within the JVM (the
  // bloomDirLock precedent; cross-process maintenance is single-
  // writer by the family contract)
  private val dirLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    dirLocks.computeIfAbsent(table, _ => new Object)

  // ---- shared staged-publish protocol (flat `<live>__staging`) ----
  // One implementation for every flat staged rewrite in the index
  // family (Dedup doc tables, text postings, flat PQ codes, KMV
  // rows) — the round-14 review found the fourth hand-rolled copy
  // shipping with a lock gap, which is exactly the bug class a
  // single shared helper kills.

  /** PROBE-side: republish a COMPLETE staging only when the live dir
    * is missing (the crash-between-delete-and-rename window — the one
    * flat state a reader cannot serve). Never deletes anything: an
    * incomplete staging may be an in-flight maintainer's write in
    * another process, and a complete staging beside intact live reads
    * consistently as the pre-publish table.
    */
  def repairMissingLive(spark: SparkSession, live: String): Unit =
    lockFor(live).synchronized {
      val fs = hadoopFs(spark, path(live))
      val staging = path(s"${live}__staging")
      if (!fs.exists(path(live)) &&
          fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")))
        require(fs.rename(staging, path(live)),
          s"staged publish rename $staging -> $live failed")
    }

  /** WRITER-side: finish (or discard) a staged publish a previous
    * writer died inside — a COMPLETE staging republishes (it may hold
    * the only copy), an incomplete one is crash residue (maintenance
    * is single-writer by the family contract) and drops. Idempotent;
    * run before every write into the live dir.
    */
  def recoverStagedPublish(spark: SparkSession, live: String): Unit =
    lockFor(live).synchronized {
      val fs = hadoopFs(spark, path(live))
      val staging = path(s"${live}__staging")
      if (fs.exists(staging)) {
        if (fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) {
          if (fs.exists(path(live))) fs.delete(path(live), true)
          require(fs.rename(staging, path(live)),
            s"staged publish rename $staging -> $live failed")
        } else fs.delete(staging, true)
      }
    }

  /** WRITER-side commit of a freshly written COMPLETE staging:
    * delete(live) + rename under the dir lock (an in-JVM probe's
    * missing-live repair cannot interleave), with staging verified
    * present BEFORE live is deleted — a surprise state can never
    * destroy the only copy.
    */
  def publishStaged(spark: SparkSession, live: String): Unit =
    lockFor(live).synchronized {
      val fs = hadoopFs(spark, path(live))
      val staging = path(s"${live}__staging")
      require(fs.exists(staging), s"staging $staging vanished before publish")
      if (fs.exists(path(live))) fs.delete(path(live), true)
      require(fs.rename(staging, path(live)),
        s"staged publish rename $staging -> $live failed")
    }

  /** REBUILD-side: discard a stale flat staging — a leftover COMPLETE
    * `<live>__staging` from the previous index's crashed delete must
    * never be republished over the fresh table the caller is about to
    * write.
    */
  def clearStagedFlat(spark: SparkSession, live: String): Unit =
    lockFor(live).synchronized {
      val fs = hadoopFs(spark, path(live))
      val staging = path(s"${live}__staging")
      if (fs.exists(staging)) fs.delete(staging, true)
    }

  /** Discard ALL staged-delete residue (delta + journal), applied or
    * not — for FULL REBUILDS of the table: a rebuild overwrites the
    * live cells, so a leftover committed journal from the previous
    * index's crashed delete must never be re-applied on top of the
    * fresh build (recover() would do exactly that). Call BEFORE
    * writing the new table.
    */
  def clearStaged(spark: SparkSession, table: String): Unit =
    lockFor(table).synchronized {
      val fs = hadoopFs(spark, path(table))
      val journal = path(s"${table}__commit")
      val delta = path(s"${table}__delta")
      if (fs.exists(journal)) fs.delete(journal, true)
      if (fs.exists(delta)) fs.delete(delta, true)
    }

  /** PROBE-side repair: re-apply a committed journal so a reader
    * sees the post-delete index instead of a half-applied mix —
    * and NOTHING else. A probe must never roll anything back: an
    * uncommitted delta may be a LIVE delete's staging write in
    * another process, and deleting it from a read path would destroy
    * in-flight maintenance. Rollback is [[recover]], writer-only.
    */
  def repairForRead(spark: SparkSession, table: String): Unit =
    lockFor(table).synchronized {
      val fs = hadoopFs(spark, path(table))
      if (fs.exists(path(s"${table}__commit/_SUCCESS")) &&
          fs.exists(path(s"${table}__delta/_SUCCESS")))
        applyJournal(spark, table)
    }

  /** WRITER-side repair: re-apply a committed journal, roll back an
    * uncommitted staging (safe here — maintenance is single-writer
    * by the family contract, so an uncommitted delta can only be
    * crash residue). Idempotent; called before every append and
    * delete of the table.
    */
  def recover(spark: SparkSession, table: String): Unit = lockFor(table).synchronized {
    val fs = hadoopFs(spark, path(table))
    val journal = path(s"${table}__commit")
    if (fs.exists(path(s"${table}__commit/_SUCCESS")) &&
        fs.exists(path(s"${table}__delta/_SUCCESS"))) {
      applyJournal(spark, table)
    } else {
      if (fs.exists(journal)) fs.delete(journal, true)
      val delta = path(s"${table}__delta")
      if (fs.exists(delta)) fs.delete(delta, true)
    }
  }

  /** Apply (or re-apply) a committed journal: per touched cell,
    * swap in the delta directory or drop the emptied one. A cell with
    * no delta directory and emptied=false was already applied by the
    * run that crashed — skipped, never re-deleted.
    */
  private def applyJournal(spark: SparkSession, table: String): Unit = {
    val fs = hadoopFs(spark, path(table))
    // a concurrent recover() may have finished the apply (and dropped
    // the journal) while this caller waited on the lock
    if (!fs.exists(path(s"${table}__commit"))) return
    val entries = spark.read.parquet(s"${table}__commit")
      .select("cell", "emptied").collect()
      .map(r => (r.getInt(0), r.getBoolean(1)))
    entries.foreach { case (c, emptied) =>
      val liveCell = path(s"$table/cell=$c")
      val deltaCell = path(s"${table}__delta/cell=$c")
      if (fs.exists(deltaCell)) {
        if (fs.exists(liveCell)) fs.delete(liveCell, true)
        require(fs.rename(deltaCell, liveCell),
          s"cell publish rename $deltaCell -> $liveCell failed")
      } else if (emptied) {
        if (fs.exists(liveCell)) fs.delete(liveCell, true)
      }
    }
    fs.delete(path(s"${table}__commit"), true)
    fs.delete(path(s"${table}__delta"), true)
  }

  /** Delete `del` ("cid" column, distinct) from the cell-partitioned
    * `table` via the staged protocol above. Idempotent — re-removing
    * absent ids finds no touched cells and returns without writing.
    */
  def deleteIds(spark: SparkSession, table: String, del: DataFrame): Unit = {
    import spark.implicits._
    recover(spark, table)
    val live = spark.read.parquet(table)
    val touched = live.select("cid", "cell")
      .join(broadcast(del), Seq("cid"), "left_semi")
      .select("cell").distinct().as[Int].collect().toSeq.sorted
    if (touched.isEmpty) return
    val survivors = live.filter(col("cell").isin(touched.map(Integer.valueOf): _*))
      .join(broadcast(del), Seq("cid"), "left_anti")
      .localCheckpoint() // materialize before the apply mutates what it read
    survivors.write.mode("errorifexists").partitionBy("cell")
      .parquet(s"${table}__delta")
    val surviving = survivors.select("cell").distinct().as[Int].collect().toSet
    touched.map(c => (c, !surviving.contains(c))).toDF("cell", "emptied")
      .coalesce(1).write.mode("errorifexists").parquet(s"${table}__commit")
    // same lock as recover(): a concurrent probe that sees the fresh
    // journal must not apply it in parallel with this writer
    lockFor(table).synchronized { applyJournal(spark, table) }
  }
}
