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
  *
  * Since round 15 the single-writer maintenance contract is ENFORCED,
  * not assumed: every mutating window (deleteIds, the staged-publish
  * swaps, journal apply — including a probe's repair-on-read apply)
  * holds a cross-process lease file (`<dir>__lease`, heartbeat mtime,
  * stale-owner reclaim), so two maintainers in different JVMs can no
  * longer interleave delete/rename pairs. Probes stay lock-free on
  * the hot path: the lease is only taken when repair WORK is
  * detected.
  */
private[graft] object CellCommit {

  private def hadoopFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  // repair-on-read means PROBES mutate: two concurrent probes of the
  // same table must not race each other's exists→rename pairs, so
  // recovery/apply serialize per table dir within the JVM (the
  // bloomDirLock precedent)
  private val dirLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    dirLocks.computeIfAbsent(table, _ => new Object)

  // ---- cross-process maintenance lease (round 15) ------------------
  // Before this, "single-writer" was a documented family contract
  // with no enforcement: two maintainers in DIFFERENT JVMs could
  // interleave delete/rename pairs — the worst case being a probe's
  // repair applyJournal racing a live writer's, where the probe's
  // delete(liveCell) lands just after the writer's rename publishes
  // the fresh cell and the cell is lost with no recovery copy. The
  // lease makes the contract enforced: an atomically-created
  // `<dir>__lease` file (owner + epoch payload, mtime refreshed by a
  // heartbeat thread) is held across every mutating window. A second
  // maintainer waits up to `waitMs`, then refuses with the holder
  // named; a lease whose mtime stopped advancing for `staleMs` is a
  // dead owner and is reclaimed (atomic rename-aside, single winner).
  // Probes stay lock-free on the hot path — they acquire only when
  // repair WORK is detected (crash residue), which is rare and brief.

  /** Default staleness horizon: a holder that has not heartbeat for
    * this long is dead. Heartbeats run every staleMs/4 (30 s at the
    * default), so a live holder misses the horizon only if its JVM
    * pauses > 90 s — and a holder that IS stale-reclaimed during a
    * pause detects the loss at its next heartbeat and aborts its
    * protocol at the next step boundary (see [[requireLeaseLive]]).
    * The horizon is deliberately short: it bounds how long a
    * maintainer CRASH can stall probes that need a repair (probes
    * wait past the horizon and reclaim, see [[repairForRead]]).
    */
  val LeaseStaleMs: Long = 120000L

  /** Default acquisition patience before a MAINTAINER refuses. */
  val LeaseWaitMs: Long = 60000L

  /** Probe-side patience: a probe's repair is idempotent and safe
    * after a reclaim, so probes wait PAST the stale horizon (then
    * reclaim the dead owner's lease) instead of refusing — a
    * maintainer crash stalls reads for at most ~stale+wait, it never
    * fails them. A LIVE holder finishes its apply in seconds, far
    * inside this window.
    */
  val ProbeWaitMs: Long = LeaseStaleMs + LeaseWaitMs

  /** Grace before an OWNERLESS lease file (torn create: createNewFile
    * succeeded, the payload write crashed) is reclaimed regardless of
    * the stale horizon. A live creator writes its payload
    * microseconds after the create, so past this grace an ownerless
    * file can only be residue — and without this path it would block
    * every acquirer (stillOurs false for all, no heartbeat ever
    * advancing its mtime, yet mtime fresh enough to dodge the stale
    * rule) until the full horizon elapsed.
    */
  val OwnerlessGraceMs: Long = 1000L

  // ---- contention telemetry (round 16) ------------------------------
  // The lease is new load-bearing machinery; counting waits, waited
  // milliseconds, reclaims and refusals per run is the cheapest way to
  // see it misbehave in the field. Bench.scala snapshots these into
  // BENCH_DETAIL.json.
  private val statWaits = new java.util.concurrent.atomic.AtomicLong(0)
  private val statWaitMs = new java.util.concurrent.atomic.AtomicLong(0)
  private val statReclaims = new java.util.concurrent.atomic.AtomicLong(0)
  private val statRefusals = new java.util.concurrent.atomic.AtomicLong(0)

  /** Snapshot of lease-contention counters since JVM start (or the
    * last [[resetLeaseStats]]): acquisitions that had to wait at all,
    * total milliseconds waited, stale/ownerless reclaims, refusals.
    */
  def leaseStats: Map[String, Long] = Map(
    "waits" -> statWaits.get(), "wait_ms" -> statWaitMs.get(),
    "reclaims" -> statReclaims.get(), "refusals" -> statRefusals.get())

  def resetLeaseStats(): Unit = {
    statWaits.set(0); statWaitMs.set(0); statReclaims.set(0); statRefusals.set(0)
  }

  private val leaseHeartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-lease-heartbeat"); t.setDaemon(true); t
    })

  private val ownerBase =
    s"${ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName}"

  // leases this THREAD already holds, for reentrancy. Coverage is
  // EXACT-KEY only: a family entry point leasing its index dir does
  // NOT stand in for the table-dir lease its nested CellCommit steps
  // take — probes in other JVMs contend on the TABLE path, so the
  // table lease file must actually exist while the table is being
  // mutated (prefix coverage here would leave `<table>__lease`
  // uncreated and the cross-process delete/rename race open — the
  // round-15 self-review's top finding). Acquisition order is always
  // parent dir before child table, so the nesting cannot deadlock.
  private val heldByThread = new ThreadLocal[scala.collection.mutable.Map[String, Lease]] {
    override def initialValue() = scala.collection.mutable.Map.empty[String, Lease]
  }
  private def covered(dir: String): Boolean = heldByThread.get().contains(dir)

  /** Abort (throw) when the MOST-SPECIFIC lease this thread holds
    * over `dir` — the exact key if held, else the nearest ancestor
    * directory's — is no longer live on disk. Most-specific, not
    * all-of-them: probes contend on the TABLE path, so a reclaimed
    * table lease means a reclaimer may already be applying this
    * table's journal, and a still-live ancestor (family-dir) lease —
    * which probes never contend on, so it is never reclaimed — must
    * not mask that loss (round-15 advice, medium). The check is
    * SYNCHRONOUS ([[Lease.liveNow]] re-reads the lease file) rather
    * than trusting the heartbeat thread's cached flag: after a JVM
    * pause past the stale horizon there is no happens-before between
    * the protocol thread's wakeup and the heartbeat's, so the cached
    * flag can lag a destructive step by a whole heartbeat period.
    * Aborting mid-protocol is safe: every intermediate state is
    * recover()-able by construction.
    */
  private def requireLeaseLive(dir: String): Unit = {
    val held = heldByThread.get()
    val covering = held.filter { case (k, _) => dir == k || dir.startsWith(k + "/") }
    if (covering.nonEmpty && !covering.maxBy(_._1.length)._2.liveNow())
      throw new IllegalStateException(
        s"maintenance lease over $dir was lost (stale-reclaimed during a pause); " +
          "aborting mid-protocol — the next maintainer entry recovers the state")
  }

  final class Lease private[CellCommit] (
      fs: org.apache.hadoop.fs.FileSystem,
      val path: org.apache.hadoop.fs.Path,
      dirKey: String,
      owner: String) {
    private[CellCommit] def key: String = dirKey
    @volatile private[CellCommit] var hb: java.util.concurrent.ScheduledFuture[_] = null
    // set by the heartbeat when the on-disk lease is no longer ours
    // (stale-reclaimed during a pause); checked between protocol
    // steps via requireLeaseLive so a zombie holder aborts instead of
    // mutating interleaved with its reclaimer
    @volatile private[CellCommit] var lost: Boolean = false
    private[CellCommit] def stillOurs(): Boolean =
      try {
        val in = fs.open(path)
        val bytes = try in.readAllBytes() finally in.close()
        new String(bytes, "UTF-8").startsWith(s"owner=$owner\n")
      } catch { case _: java.io.IOException => false }
    /** Synchronous fence read for [[requireLeaseLive]]: re-verify the
      * on-disk lease is still ours IMMEDIATELY before a destructive
      * step. The cached `lost` flag alone is asynchronous — it is set
      * by the heartbeat thread, and after a JVM pause past the stale
      * horizon the resumed protocol thread can run up to a heartbeat
      * period before that thread wakes (no happens-before between the
      * two wakeups). A missing lease file is a definitive loss (the
      * reclaim arbiter renames it aside); any OTHER read error falls
      * back to the heartbeat's cached verdict instead of aborting a
      * healthy holder on a transient IO hiccup.
      */
    private[CellCommit] def liveNow(): Boolean = {
      if (lost) return false
      val verdict =
        try {
          val in = fs.open(path)
          val bytes = try in.readAllBytes() finally in.close()
          new String(bytes, "UTF-8").startsWith(s"owner=$owner\n")
        } catch {
          case _: java.io.FileNotFoundException => false
          case _: java.io.IOException => !lost
        }
      if (!verdict) { lost = true; if (hb != null) hb.cancel(false) }
      verdict
    }
    private[CellCommit] def heartbeat(): Unit = {
      if (!lost && !stillOurs()) { lost = true; if (hb != null) hb.cancel(false) }
      if (!lost)
        try fs.setTimes(path, System.currentTimeMillis(), -1)
        catch { case _: java.io.IOException => () }
    }
    /** Release by atomic rename-aside + owner re-verify, mirroring the
      * reclaim arbiter. A plain stillOurs()-then-delete is
      * check-then-act: between the read and the delete a reclaimer can
      * rename this lease aside and a NEW maintainer can create a fresh
      * lease at the same path — the delete would then remove the new
      * holder's lease and admit a third writer (round-15 advice). The
      * rename is the atomic claim; ownership is verified on the
      * renamed file, and a stranger's lease is put back.
      */
    def release(): Unit = {
      if (hb != null) hb.cancel(false)
      val aside = new org.apache.hadoop.fs.Path(
        s"${path}.release.${java.util.UUID.randomUUID()}")
      try {
        if (fs.rename(path, aside)) {
          val ours =
            try {
              val in = fs.open(aside)
              try new String(in.readAllBytes(), "UTF-8")
                .startsWith(s"owner=$owner\n")
              finally in.close()
            } catch { case _: java.io.IOException => false }
          if (ours) fs.delete(aside, false)
          else if (!renameNoReplace(fs, aside, path))
            // a third acquirer created a fresh lease in the window
            // (the no-replace put-back must NOT overwrite it — POSIX
            // rename would); the displaced holder's own fence sees
            // the loss and aborts (recover()-safe), so dropping the
            // aside is the consistent end state
            fs.delete(aside, false)
        }
      } catch { case _: java.io.IOException => () }
    }
  }

  /** True create-if-absent WITH the payload in place atomically. The
    * Hadoop local FS create(path, false) is exists-then-create (TOCTOU
    * window between two processes), and even createNewFile + separate
    * write leaves a zero-byte ownerless window in which the ownerless
    * reclaim could hand the path to a successor whose lease the
    * resumed creator's write would then truncate-overwrite. So the
    * file scheme writes the payload to a sibling temp file and claims
    * the path by hard LINK — POSIX link(2) fails if the target exists
    * and publishes the payload atomically, so the lease file is never
    * observable empty. Other schemes (HDFS, object-store committers)
    * make create(overwrite=false) atomic themselves; their
    * create-to-close torn window is what [[OwnerlessGraceMs]] heals.
    */
  private def tryAtomicCreate(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, payload: Array[Byte]): Boolean = {
    if (fs.getScheme == "file") {
      val f = new java.io.File(p.toUri.getPath)
      // fast path: a HELD lease is the common outcome of the 100 ms
      // poll loop — don't pay a tmp write+link+unlink per poll; the
      // LINK below stays the actual arbiter when the path looks free
      if (f.exists()) return false
      val parent = f.getParentFile
      if (parent != null) parent.mkdirs()
      val tmp = new java.io.File(parent,
        s".${f.getName}.tmp.${java.util.UUID.randomUUID()}")
      try {
        java.nio.file.Files.write(tmp.toPath, payload)
        try { java.nio.file.Files.createLink(f.toPath, tmp.toPath); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false // lost the race
          case _: UnsupportedOperationException | _: java.io.IOException =>
            // link(2) unsupported on this mount — FAT/SMB/overlay
            // reject it with a FileSystemException (an IOException),
            // providers without createLink throw UnsupportedOperation;
            // either way fall back to the two-step create rather than
            // bricking acquisition, and let the ownerless reclaim heal
            // a torn write
            try f.createNewFile() &&
              { java.nio.file.Files.write(f.toPath, payload); true }
            catch { case _: java.io.IOException => false }
        }
      } catch { case _: java.io.IOException => false } // tmp write failed
      finally tmp.delete()
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(payload) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /** Atomic no-replace rename for the put-back side of the two
    * arbiters: POSIX rename(2) REPLACES an existing destination, so a
    * plain rename-back on the file scheme could silently overwrite a
    * THIRD acquirer's fresh lease created in the arbitration window.
    * The file scheme claims the destination by hard LINK (the same
    * no-replace primitive the create uses) then drops the source;
    * HDFS-class schemes' rename already fails on an existing
    * destination. Returns false when the destination exists.
    */
  private[graft] def renameNoReplace(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (fs.getScheme == "file") {
      val s = new java.io.File(src.toUri.getPath)
      val d = new java.io.File(dst.toUri.getPath)
      try {
        java.nio.file.Files.createLink(d.toPath, s.toPath)
        s.delete(); true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException | _: java.io.IOException =>
          // no link support on this mount: best-effort exists-then-
          // rename; the holders' synchronous fences bound the residual
          // TOCTOU window exactly as they do for any displaced lease
          if (d.exists()) false
          else try fs.rename(src, dst)
          catch { case _: java.io.IOException => false }
      }
    } else
      try fs.rename(src, dst)
      catch { case _: java.io.IOException => false }

  /** Reclaim arbiter: claim the lease file by atomic rename-aside,
    * then drop it ONLY when the renamed file is the SAME stale corpse
    * the caller judged — verified by mtime equality with the observed
    * file status. Without the re-verify the arbiter is check-then-act:
    * between the caller's staleness read and its rename another
    * reclaimer can win, delete the corpse, and a NEW holder create a
    * fresh healthy lease at the path — the rename would then displace
    * the successor, not the corpse, and the delete would admit a
    * second concurrent writer. On mismatch the fresh lease is put back
    * by no-replace rename; if a third lease already took the path in
    * the window, the aside is dropped — the displaced holder's own
    * synchronous fence sees the loss and aborts recover()-safely (the
    * same arbitration [[Lease.release]] uses). Returns true only for a
    * real reclaim.
    *
    * Filesystem seam: the mtime-equality identity check relies on
    * RENAME PRESERVING MTIME — true of POSIX rename(2) and HDFS, the
    * lease's documented contract. A copy-based rename (S3-class
    * stores) stamps a fresh mtime, which would make every re-verify
    * fail AND refresh the corpse's stale clock — one more reason such
    * stores must front this protocol with a committer (SURVEY §5).
    */
  private[graft] def reclaimObservedStale(fs: org.apache.hadoop.fs.FileSystem,
      leaseP: org.apache.hadoop.fs.Path, dir: String,
      observedMtime: Long): Boolean = {
    val aside = path(s"${dir}__lease.reclaim.${java.util.UUID.randomUUID()}")
    if (!fs.rename(leaseP, aside)) false
    else {
      val sameStale =
        try fs.getFileStatus(aside).getModificationTime == observedMtime
        catch { case _: java.io.IOException => false }
      if (sameStale) {
        fs.delete(aside, false); statReclaims.incrementAndGet(); true
      } else {
        if (!renameNoReplace(fs, aside, leaseP)) fs.delete(aside, false)
        false
      }
    }
  }

  /** Acquire the maintenance lease for `dir`, waiting up to `waitMs`
    * and reclaiming a stale holder (mtime older than `staleMs`).
    * Throws IllegalStateException, naming the holder, when the lease
    * stays held past the patience window — the "second maintainer
    * refuses" contract.
    */
  def acquireLease(spark: SparkSession, dir: String,
      staleMs: Long = LeaseStaleMs, waitMs: Long = LeaseWaitMs): Lease = {
    val leaseP = path(s"${dir}__lease")
    val fs = hadoopFs(spark, leaseP)
    val owner = s"$ownerBase/${java.util.UUID.randomUUID()}"
    val payload =
      s"owner=$owner\nepoch=${System.currentTimeMillis()}\n".getBytes("UTF-8")
    val t0 = System.nanoTime()
    val deadline = t0 + waitMs * 1000000L
    var first = true
    while (first || System.nanoTime() < deadline) {
      val waited = !first
      first = false
      if (tryAtomicCreate(fs, leaseP, payload)) {
        if (waited) {
          statWaits.incrementAndGet()
          statWaitMs.addAndGet((System.nanoTime() - t0) / 1000000L)
        }
        // sweep create tmps a crashed creator leaked (killed between
        // its tmp write and link — nothing else ever deletes them);
        // age-gated by the stale horizon so a LIVE creator's in-flight
        // tmp is never touched. Paid once per successful acquisition.
        if (fs.getScheme == "file") {
          val leaseF = new java.io.File(leaseP.toUri.getPath)
          val pfx = s".${leaseF.getName}.tmp."
          val old = System.currentTimeMillis() - staleMs
          Option(leaseF.getParentFile.listFiles()).getOrElse(Array.empty)
            .filter(t => t.getName.startsWith(pfx) && t.lastModified() < old)
            .foreach(_.delete())
        }
        val lease = new Lease(fs, leaseP, dir, owner)
        // heartbeat STRICTLY inside the stale horizon (min 4 beats per
        // horizon even for test-sized staleMs — a floor at the horizon
        // itself would let a live holder look stale between beats)
        val hbEvery = math.max(staleMs / 4, 50L)
        lease.hb = leaseHeartbeats.scheduleAtFixedRate(
          () => lease.heartbeat(),
          hbEvery, hbEvery, java.util.concurrent.TimeUnit.MILLISECONDS)
        return lease
      }
      // held by someone: reclaim if their heartbeat stopped, or if the
      // file is OWNERLESS past a short grace (torn create — see
      // [[OwnerlessGraceMs]]; a torn file has no heartbeat, so waiting
      // out the full horizon would stall every acquirer including the
      // torn creator itself). The rename-aside is the atomic arbiter —
      // two reclaimers both see the lease dead, but only one wins the
      // rename; the loser just loops back to the create race.
      try {
        val st = fs.getFileStatus(leaseP)
        val age = System.currentTimeMillis() - st.getModificationTime
        val ownerless = age > OwnerlessGraceMs && age <= staleMs && {
          try {
            val in = fs.open(leaseP)
            val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
            !txt.linesIterator.exists(_.startsWith("owner="))
          } catch { case _: java.io.IOException => false } // vanished/torn read: loop
        }
        if (age > staleMs || ownerless)
          reclaimObservedStale(fs, leaseP, dir, st.getModificationTime)
      } catch { case _: java.io.IOException => () } // vanished: loop re-creates
      Thread.sleep(100)
    }
    val holder =
      try {
        val in = fs.open(leaseP)
        try new String(in.readAllBytes(), "UTF-8").linesIterator
          .find(_.startsWith("owner=")).getOrElse("owner=?")
        finally in.close()
      } catch { case _: java.io.IOException => "owner=? (lease vanished mid-read)" }
    statRefusals.incrementAndGet()
    statWaitMs.addAndGet((System.nanoTime() - t0) / 1000000L)
    throw new IllegalStateException(
      s"maintenance lease ${leaseP} is held (${holder}); a second maintainer " +
        s"refuses after ${waitMs} ms — maintenance is single-writer per index")
  }

  /** Run `body` holding the maintenance lease for `dir`. Reentrant
    * per thread on the SAME key only: a family entry point leasing
    * its index dir does NOT substitute for the table-dir lease nested
    * protocol steps take — the table lease file must exist while the
    * table is mutated, because probes in other JVMs contend on the
    * table path (exact-key coverage; acquisition order parent→child,
    * so the nesting cannot deadlock).
    */
  /** TEST hook: cancel a lease's heartbeat thread, simulating a JVM
    * pause past the stale horizon (the zombie-holder scenario) — the
    * on-disk mtime then stops advancing exactly as it would during a
    * real stop-the-world pause, while the protocol thread stays
    * runnable for the spec to drive. The no-op barrier drains a beat
    * already EXECUTING on the (single-threaded) scheduler: without it
    * an in-flight setTimes could land after the spec backdates the
    * lease file, un-staling it and flaking the reclaim.
    */
  private[graft] def suspendHeartbeatForTest(l: Lease): Unit = {
    if (l.hb != null) l.hb.cancel(false)
    leaseHeartbeats.submit(new Runnable { def run(): Unit = () }).get()
  }

  /** TEST hook: the lease this thread holds for `dir`, if any. */
  private[graft] def heldLeaseForTest(dir: String): Option[Lease] =
    heldByThread.get().get(dir)

  def withMaintenanceLease[T](spark: SparkSession, dir: String,
      staleMs: Long = LeaseStaleMs, waitMs: Long = LeaseWaitMs)(body: => T): T =
    if (covered(dir)) body
    else {
      val lease = acquireLease(spark, dir, staleMs, waitMs)
      // reentrancy registration lives HERE, not in acquireLease: a
      // raw Lease may legitimately be released by another thread, and
      // registering in acquire would strand this thread's entry
      heldByThread.get().put(dir, lease)
      try body finally {
        heldByThread.get().remove(dir)
        lease.release()
      }
    }

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
  def repairMissingLive(spark: SparkSession, live: String): Unit = {
    // hot-path probe: two exists() checks, no lock, no lease
    val fs = hadoopFs(spark, path(live))
    val staging = path(s"${live}__staging")
    if (fs.exists(path(live)) ||
        !fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) return
    // repair work detected: take the cross-process lease so this
    // probe cannot interleave with a live writer's publish (the
    // writer holds the lease across its delete+rename), then re-check
    // — the writer may have finished the publish while we waited.
    // Probe patience extends past the stale horizon: a crashed
    // maintainer's lease residue is reclaimed, never turned into a
    // thrown read
    withMaintenanceLease(spark, live, waitMs = ProbeWaitMs) {
      lockFor(live).synchronized {
        if (!fs.exists(path(live)) &&
            fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) {
          requireLeaseLive(live) // zombie fence before the publish rename
          require(fs.rename(staging, path(live)),
            s"staged publish rename $staging -> $live failed")
        }
      }
    }
  }

  /** WRITER-side: finish (or discard) a staged publish a previous
    * writer died inside — a COMPLETE staging republishes (it may hold
    * the only copy), an incomplete one is crash residue (maintenance
    * is single-writer by the family contract) and drops. Idempotent;
    * run before every write into the live dir.
    */
  def recoverStagedPublish(spark: SparkSession, live: String): Unit = {
    val fs = hadoopFs(spark, path(live))
    val staging = path(s"${live}__staging")
    if (!fs.exists(staging)) return
    withMaintenanceLease(spark, live) {
      lockFor(live).synchronized {
        if (fs.exists(staging)) {
          requireLeaseLive(live) // zombie fence before the destructive pair
          if (fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) {
            if (fs.exists(path(live))) fs.delete(path(live), true)
            require(fs.rename(staging, path(live)),
              s"staged publish rename $staging -> $live failed")
          } else fs.delete(staging, true)
        }
      }
    }
  }

  /** WRITER-side commit of a freshly written COMPLETE staging:
    * delete(live) + rename under the dir lock (an in-JVM probe's
    * missing-live repair cannot interleave), with staging verified
    * present BEFORE live is deleted — a surprise state can never
    * destroy the only copy.
    */
  def publishStaged(spark: SparkSession, live: String): Unit =
    withMaintenanceLease(spark, live) {
      lockFor(live).synchronized {
        val fs = hadoopFs(spark, path(live))
        val staging = path(s"${live}__staging")
        require(fs.exists(staging), s"staging $staging vanished before publish")
        requireLeaseLive(live) // zombie fence before the destructive pair
        if (fs.exists(path(live))) fs.delete(path(live), true)
        require(fs.rename(staging, path(live)),
          s"staged publish rename $staging -> $live failed")
      }
    }

  /** REBUILD-side: discard a stale flat staging — a leftover COMPLETE
    * `<live>__staging` from the previous index's crashed delete must
    * never be republished over the fresh table the caller is about to
    * write.
    */
  def clearStagedFlat(spark: SparkSession, live: String): Unit = {
    val fs = hadoopFs(spark, path(live))
    val staging = path(s"${live}__staging")
    if (!fs.exists(staging)) return
    withMaintenanceLease(spark, live) {
      lockFor(live).synchronized {
        if (fs.exists(staging)) {
          requireLeaseLive(live) // zombie fence before the staging drop
          fs.delete(staging, true)
        }
      }
    }
  }

  /** Discard ALL staged-delete residue (delta + journal), applied or
    * not — for FULL REBUILDS of the table: a rebuild overwrites the
    * live cells, so a leftover committed journal from the previous
    * index's crashed delete must never be re-applied on top of the
    * fresh build (recover() would do exactly that). Call BEFORE
    * writing the new table.
    */
  def clearStaged(spark: SparkSession, table: String): Unit = {
    val fs = hadoopFs(spark, path(table))
    val journal = path(s"${table}__commit")
    val delta = path(s"${table}__delta")
    if (!fs.exists(journal) && !fs.exists(delta)) return
    withMaintenanceLease(spark, table) {
      lockFor(table).synchronized {
        requireLeaseLive(table) // zombie fence before the residue drops
        if (fs.exists(journal)) fs.delete(journal, true)
        if (fs.exists(delta)) fs.delete(delta, true)
      }
    }
  }

  /** PROBE-side repair: re-apply a committed journal so a reader
    * sees the post-delete index instead of a half-applied mix —
    * and NOTHING else. A probe must never roll anything back: an
    * uncommitted delta may be a LIVE delete's staging write in
    * another process, and deleting it from a read path would destroy
    * in-flight maintenance. Rollback is [[recover]], writer-only.
    */
  def repairForRead(spark: SparkSession, table: String): Unit = {
    // hot-path probe: two exists() checks, no lock, no lease
    val fs = hadoopFs(spark, path(table))
    if (!fs.exists(path(s"${table}__commit/_SUCCESS")) ||
        !fs.exists(path(s"${table}__delta/_SUCCESS"))) return
    // a committed journal is visible: either crash residue (lease
    // free or stale — acquire/reclaim and apply; probe patience
    // extends past the stale horizon so a crashed maintainer never
    // turns into a thrown read) or a LIVE delete between its journal
    // write and its apply (lease held with heartbeats — wait; the
    // writer's own apply drops the journal in seconds, and the
    // re-check under the lease no-ops). Without the lease this
    // probe's delete(liveCell) could land just after the writer's
    // rename published the fresh cell — the cell would be lost with
    // no recovery copy (round-15 advice, medium).
    withMaintenanceLease(spark, table, waitMs = ProbeWaitMs) {
      lockFor(table).synchronized {
        if (fs.exists(path(s"${table}__commit/_SUCCESS")) &&
            fs.exists(path(s"${table}__delta/_SUCCESS")))
          applyJournal(spark, table)
      }
    }
  }

  /** WRITER-side repair: re-apply a committed journal, roll back an
    * uncommitted staging (safe here — maintenance is single-writer
    * by the family contract, so an uncommitted delta can only be
    * crash residue). Idempotent; called before every append and
    * delete of the table.
    */
  def recover(spark: SparkSession, table: String): Unit = {
    val fs = hadoopFs(spark, path(table))
    val journal = path(s"${table}__commit")
    val delta = path(s"${table}__delta")
    if (!fs.exists(journal) && !fs.exists(delta)) return // nothing to do
    withMaintenanceLease(spark, table) {
      lockFor(table).synchronized {
        if (fs.exists(path(s"${table}__commit/_SUCCESS")) &&
            fs.exists(path(s"${table}__delta/_SUCCESS"))) {
          applyJournal(spark, table)
        } else {
          requireLeaseLive(table) // zombie fence before the rollback drops
          if (fs.exists(journal)) fs.delete(journal, true)
          if (fs.exists(delta)) fs.delete(delta, true)
        }
      }
    }
  }

  /** One named filesystem mutation of the journal-apply protocol —
    * the granularity at which a crash can interrupt it. Each step's
    * closure carries its own state guards, so re-executing a step
    * list from ANY prefix (what [[recover]] does after a crash) is
    * safe; the spec-side crash fuzz executes every proper prefix and
    * asserts old-or-new.
    */
  private[graft] final case class Step(desc: String, run: () => Unit)

  /** The journal-apply protocol as an explicit step list: per touched
    * cell (ascending cell order), clear the stale live cell then swap
    * in the delta directory (or just drop an emptied cell); finally
    * drop journal then delta. A cell with no delta directory and
    * emptied=false was already applied by the run that crashed —
    * skipped, never re-deleted. Empty when no journal is present.
    */
  private[graft] def applyJournalSteps(spark: SparkSession, table: String): Seq[Step] = {
    val fs = hadoopFs(spark, path(table))
    // a concurrent recover() may have finished the apply (and dropped
    // the journal) while this caller waited on the lock
    if (!fs.exists(path(s"${table}__commit"))) return Seq.empty
    val entries = spark.read.parquet(s"${table}__commit")
      .select("cell", "emptied").collect()
      .map(r => (r.getInt(0), r.getBoolean(1))).sortBy(_._1)
    entries.toSeq.flatMap { case (c, emptied) =>
      val liveCell = path(s"$table/cell=$c")
      val deltaCell = path(s"${table}__delta/cell=$c")
      if (emptied)
        Seq(Step(s"drop emptied live cell=$c", () => {
          // guard: only drop while the journal still names the cell
          // emptied AND no delta exists (it never does for emptied
          // cells); re-runs after the journal drop never reach here
          if (!fs.exists(deltaCell) && fs.exists(liveCell))
            fs.delete(liveCell, true)
        }))
      else Seq(
        Step(s"clear stale live cell=$c", () => {
          if (fs.exists(deltaCell) && fs.exists(liveCell))
            fs.delete(liveCell, true)
        }),
        Step(s"publish delta cell=$c", () => {
          if (fs.exists(deltaCell)) {
            if (fs.exists(liveCell)) fs.delete(liveCell, true)
            require(fs.rename(deltaCell, liveCell),
              s"cell publish rename $deltaCell -> $liveCell failed")
          }
        }))
    } ++ Seq(
      Step("drop journal", () => fs.delete(path(s"${table}__commit"), true)),
      Step("drop delta", () => fs.delete(path(s"${table}__delta"), true)))
  }

  /** Apply (or re-apply) a committed journal by running its step list
    * to the end. Caller must hold the table lock and the maintenance
    * lease.
    */
  private def applyJournal(spark: SparkSession, table: String): Unit =
    applyJournalSteps(spark, table).foreach { s =>
      // zombie fence: a holder whose lease was stale-reclaimed during
      // a pause must stop mutating before its next destructive step
      requireLeaseLive(table)
      s.run()
    }

  /** Delete `del` ("cid" column, distinct) from the cell-partitioned
    * `table` via the staged protocol above. Idempotent — re-removing
    * absent ids finds no touched cells and returns without writing.
    */
  def deleteIds(spark: SparkSession, table: String, del: DataFrame): Unit =
    // the lease spans survivor write → journal commit → apply: a probe
    // that sees the fresh journal waits on the lease instead of racing
    // this writer's delete/rename pairs, and a second maintainer in
    // another process refuses at entry
    withMaintenanceLease(spark, table) {
      import spark.implicits._
      recover(spark, table)
      val live = spark.read.parquet(table)
      val touched = live.select("cid", "cell")
        .join(broadcast(del), Seq("cid"), "left_semi")
        .select("cell").distinct().as[Int].collect().toSeq.sorted
      if (touched.nonEmpty) {
        val survivors = live.filter(col("cell").isin(touched.map(Integer.valueOf): _*))
          .join(broadcast(del), Seq("cid"), "left_anti")
          // hash-distribute by cell before the partitioned staging
          // write (guide §6): one survivor file per touched cell, not
          // one per (read task × cell)
          .repartition(col("cell"))
          .localCheckpoint() // materialize before the apply mutates what it read
        survivors.write.mode("errorifexists").partitionBy("cell")
          .parquet(s"${table}__delta")
        val surviving = survivors.select("cell").distinct().as[Int].collect().toSet
        touched.map(c => (c, !surviving.contains(c))).toDF("cell", "emptied")
          .coalesce(1).write.mode("errorifexists").parquet(s"${table}__commit")
        // same lock as recover(): a concurrent IN-JVM probe that sees
        // the fresh journal must not apply it in parallel either
        lockFor(table).synchronized { applyJournal(spark, table) }
      }
    }
}
