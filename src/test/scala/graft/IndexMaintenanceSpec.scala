package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance contracts of the persisted dedup indexes (D58 bands,
  * D113 grams, D115 bloom, D122 winnow): stored params are LAW on
  * re-build (mismatch refuses, match routes to the append path),
  * appends compose to the from-scratch build over the union, repeated
  * appends are idempotent, and a crash between a fresh build's
  * params/data writes leaves a state the next build repairs instead
  * of dying on an opaque already-exists error.
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables(spark, sf, "documents").select("doc_id", "lang", "text")
  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).resolve("idx").toString

  // --- D58: signature (band) index ----------------------------------

  test("D58 signature index: rebuild with different params refuses") {
    val dir = tmp("sig_idx_refuse")
    Dedup.writeSignatureIndex(docs.limit(40), "doc_id", "text", dir,
      shingleN = 3, numHashes = 12, numBands = 4)
    intercept[IllegalArgumentException] {
      Dedup.writeSignatureIndex(docs.limit(40), "doc_id", "text", dir,
        shingleN = 4, numHashes = 12, numBands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.writeSignatureIndex(docs.limit(40), "doc_id", "text", dir,
        shingleN = 3, numHashes = 16, numBands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.writeSignatureIndex(docs.limit(40), "doc_id", "text", dir,
        shingleN = 3, numHashes = 12, numBands = 6)
    }
    // params unchanged after the refusals
    val p = spark.read.parquet(s"$dir/params").head()
    assert((p.getInt(0), p.getInt(1), p.getInt(2)) === ((3, 12, 4)))
  }

  test("D58 signature index: matching rebuild appends, idempotently; seed+append == one-shot") {
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    val probe = docs.filter(col("doc_id") % 2 === 1)
    def pairs(dir: String) =
      Dedup.incrementalNearDup(spark, dir, probe, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = tmp("sig_idx_incr")
    Dedup.writeSignatureIndex(a, "doc_id", "text", incr, 3, 12, 4)
    Dedup.appendSignatureIndex(spark, incr, b, "doc_id", "text")
    val oneShot = tmp("sig_idx_oneshot")
    Dedup.writeSignatureIndex(a.unionByName(b), "doc_id", "text", oneShot, 3, 12, 4)
    val got = pairs(incr)
    assert(got === pairs(oneShot))
    assert(got.nonEmpty, "fixture produced no LSH candidates — test is vacuous")
    // re-submitting an already-indexed batch adds nothing
    val before = spark.read.parquet(s"$incr/bands").count()
    Dedup.appendSignatureIndex(spark, incr, b, "doc_id", "text")
    assert(spark.read.parquet(s"$incr/bands").count() === before)
    // a matching RE-BUILD routes through the same append (no dup rows)
    Dedup.writeSignatureIndex(a, "doc_id", "text", incr, 3, 12, 4)
    assert(spark.read.parquet(s"$incr/bands").count() === before)
  }

  test("D58 signature index: params-only dir (crash residue) is repaired by the next build") {
    val dir = tmp("sig_idx_crash")
    Dedup.writeSignatureIndex(docs.limit(30), "doc_id", "text", dir, 3, 12, 4)
    // simulate a crash between the params and bands writes
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    rmrf(java.nio.file.Paths.get(s"$dir/bands"))
    Dedup.writeSignatureIndex(docs.limit(30), "doc_id", "text", dir, 3, 12, 4)
    assert(spark.read.parquet(s"$dir/bands").count() > 0)
  }

  // --- D122: winnow fingerprint index --------------------------------

  test("D122 winnow index: append composes to from-scratch over the union") {
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    val probe = docs.filter(col("doc_id") % 2 === 1)
    def report(dir: String) =
      Dedup.probeWinnowIndex(spark, dir, probe, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_fp"), r.getAs[Long]("n_hit"), r.getAs[Long]("hit_ppm"),
            r.getAs[Int]("first_hit")))).toMap
    val incr = tmp("win_idx_incr")
    Dedup.writeWinnowIndex(a, "doc_id", "text", k = 4, w = 3, incr)
    Dedup.appendWinnowIndex(spark, incr, b, "doc_id", "text")
    val oneShot = tmp("win_idx_oneshot")
    Dedup.writeWinnowIndex(a.unionByName(b), "doc_id", "text", k = 4, w = 3, oneShot)
    val got = report(incr)
    assert(got === report(oneShot))
    assert(got.values.exists(_._2 > 0L), "no probe hits — test is vacuous")
    // idempotent re-append
    val before = spark.read.parquet(s"$incr/fps").count()
    Dedup.appendWinnowIndex(spark, incr, b, "doc_id", "text")
    assert(spark.read.parquet(s"$incr/fps").count() === before)
  }

  test("D122 winnow index: rebuild params are law") {
    val dir = tmp("win_idx_refuse")
    Dedup.writeWinnowIndex(docs.limit(30), "doc_id", "text", k = 4, w = 3, dir)
    intercept[IllegalArgumentException] {
      Dedup.writeWinnowIndex(docs.limit(30), "doc_id", "text", k = 5, w = 3, dir)
    }
    intercept[IllegalArgumentException] {
      Dedup.writeWinnowIndex(docs.limit(30), "doc_id", "text", k = 4, w = 4, dir)
    }
    // matching rebuild = append; fingerprint set unchanged for same corpus
    val before = spark.read.parquet(s"$dir/fps").count()
    Dedup.writeWinnowIndex(docs.limit(30), "doc_id", "text", k = 4, w = 3, dir)
    assert(spark.read.parquet(s"$dir/fps").count() === before)
  }

  // --- D123: simhash fingerprint index --------------------------------

  test("D123 simhash banded probe is LOSSLESS for Hamming<=3 (pigeonhole) and params are law") {
    val dir = tmp("simhash_idx")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    Dedup.writeSimhashIndex(corpus, "doc_id", "text", dir)
    val banded = Dedup.incrementalSimhashDup(spark, dir, batch, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force: every (odd, even) pair within Hamming 3 — feasible
    // at sf0.001 (250 x 250)
    val sigs = Dedup.simhash48Fingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      (dn, sn) <- sigs.iterator if dn % 2 == 1
      (dc, sc) <- sigs.iterator if dc % 2 == 0
      h = java.lang.Long.bitCount(sn ^ sc) if h <= 3
    } yield (dn, dc, h)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "no Hamming<=3 pairs in fixture — test is vacuous")
    // idempotent append + params-as-law rebuild
    val before = spark.read.parquet(s"$dir/sigs").count()
    Dedup.appendSimhashIndex(spark, dir, corpus, "doc_id", "text")
    assert(spark.read.parquet(s"$dir/sigs").count() === before)
    Dedup.writeSimhashIndex(corpus, "doc_id", "text", dir) // matching rebuild = append
    assert(spark.read.parquet(s"$dir/sigs").count() === before)
    // the guarantee gate: maxHamming >= bands is refused
    intercept[IllegalArgumentException] {
      Dedup.incrementalSimhashDup(spark, dir, batch, "doc_id", "text", 4)
    }
  }

  // --- D115: bloom sketch tier ---------------------------------------

  test("D115 bloom append: recall contract holds over the grown corpus, untouched buckets survive") {
    val work = java.nio.file.Files.createTempDirectory("bloom_append")
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    val probe = docs.filter(col("doc_id") % 2 === 1)
    val exactDir = work.resolve("exact").toString
    Dedup.writeGramIndex(a.unionByName(b), "doc_id", "text", n = 5, exactDir)
    val sketchDir = work.resolve("sketch").toString
    Dedup.writeGramBloomIndex(a, "doc_id", "text", n = 5, sketchDir,
      numBuckets = 8, fppPpm = 10000L)
    Dedup.appendGramBloomIndex(spark, sketchDir, b, "doc_id", "text")
    // zero false negatives vs the EXACT index over the union: every
    // dup-gram start from either the seed or the appended half flags
    val audit = Dedup.sketchGuardRecallAudit(spark, exactDir, sketchDir,
      probe, "doc_id", "text").collect()
    assert(audit.nonEmpty)
    assert(audit.forall(_.getAs[Long]("missed_by_sketch") == 0L),
      "append lost seed or batch grams — false negative")
    assert(audit.exists(_.getAs[Long]("dup_ngrams") > 0L), "no dups — vacuous")
    // still exactly one row per bucket
    val buckets = spark.read.parquet(s"$sketchDir/bloom")
      .select("bucket").collect().map(_.getInt(0))
    assert(buckets.length === buckets.distinct.length)
  }

  test("D115 bloom append: probe cache invalidates — post-append probes see the merged sketch") {
    val work = java.nio.file.Files.createTempDirectory("bloom_cache")
    val d = work.resolve("s").toString
    val seedDoc = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val appendDoc = Seq((2L, "p q r s t u v w")).toDF("doc_id", "text")
    Dedup.writeGramBloomIndex(seedDoc, "doc_id", "text", n = 3, d,
      numBuckets = 4, fppPpm = 1000L)
    val batch = Seq((11L, "x p q r s y")).toDF("doc_id", "text")
    // prime the cache: batch hits nothing in the seed-only sketch
    val preAppend = Dedup.incrementalDuplicatedSpansSketch(spark, d, batch,
      "doc_id", "text").collect().head
    assert(preAppend.getAs[Long]("dup_ngrams") === 0L)
    Dedup.appendGramBloomIndex(spark, d, appendDoc, "doc_id", "text")
    // the SAME probe now flags the appended grams — a stale cached
    // broadcast would still read 0
    val postAppend = Dedup.incrementalDuplicatedSpansSketch(spark, d, batch,
      "doc_id", "text").collect().head
    assert(postAppend.getAs[Long]("dup_ngrams") === 2L,
      s"expected starts 1,2 to flag post-append, got $postAppend")
    Dedup.unloadBloomIndex(d)
  }

  // --- round 13: DELETE maintenance (remove → tombstone → compact) ---

  test("D58 delete: remove masks probes, compact folds physically, delete-then-append round-trips") {
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    val probe = docs.filter(col("doc_id") % 2 === 1)
    def pairs(dir: String) =
      Dedup.incrementalNearDup(spark, dir, probe, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = tmp("sig_idx_delete")
    Dedup.writeSignatureIndex(a.unionByName(b), "doc_id", "text", dir, 3, 12, 4)
    Dedup.removeDocsFromSignatureIndex(spark, dir, a.select("doc_id"), "doc_id")
    val survivorsOnly = tmp("sig_idx_surv")
    Dedup.writeSignatureIndex(b, "doc_id", "text", survivorsOnly, 3, 12, 4)
    assert(pairs(dir) === pairs(survivorsOnly),
      "tombstone-masked probe must equal from-scratch over survivors")
    // re-delete is idempotent
    Dedup.removeDocsFromSignatureIndex(spark, dir, a.select("doc_id"), "doc_id")
    assert(pairs(dir) === pairs(survivorsOnly))
    // append of a tombstoned id refuses until compact
    intercept[IllegalArgumentException] {
      Dedup.appendSignatureIndex(spark, dir, a.limit(1), "doc_id", "text")
    }
    // compact: physical rows gone, tombstones cleared, probe unchanged
    Dedup.compactSignatureIndex(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    val aIds = a.select("doc_id").collect().map(_.getLong(0)).toSet
    val left = spark.read.parquet(s"$dir/bands").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(left.intersect(aIds).isEmpty, "compact must drop tombstoned rows")
    assert(pairs(dir) === pairs(survivorsOnly))
    // delete-then-append: after compact the removed docs re-add cleanly
    Dedup.appendSignatureIndex(spark, dir, a, "doc_id", "text")
    val full = tmp("sig_idx_full")
    Dedup.writeSignatureIndex(a.unionByName(b), "doc_id", "text", full, 3, 12, 4)
    assert(pairs(dir) === pairs(full),
      "compact + re-append must equal the never-deleted index")
  }

  test("append mutation refusal: re-submitting a doc whose text changed fails fast (bands/sigs/grams/fps)") {
    val orig = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val changed = Seq((1L, "a b c d e f g h i CHANGED")).toDF("doc_id", "text")
    val same = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    locally {
      val d = tmp("sig_mut")
      Dedup.writeSignatureIndex(orig, "doc_id", "text", d, 3, 12, 4)
      intercept[IllegalArgumentException] {
        Dedup.appendSignatureIndex(spark, d, changed, "doc_id", "text")
      }
      Dedup.appendSignatureIndex(spark, d, same, "doc_id", "text") // no-op, no refusal
      assert(spark.read.parquet(s"$d/bands").filter(col("doc_id") === 1L).count() === 4L)
    }
    locally {
      val d = tmp("simhash_mut")
      Dedup.writeSimhashIndex(orig, "doc_id", "text", d)
      intercept[IllegalArgumentException] {
        Dedup.appendSimhashIndex(spark, d, changed, "doc_id", "text")
      }
      Dedup.appendSimhashIndex(spark, d, same, "doc_id", "text")
      assert(spark.read.parquet(s"$d/sigs").filter(col("doc_id") === 1L).count() === 1L)
    }
    locally {
      val d = tmp("gram_mut")
      Dedup.writeGramIndex(orig, "doc_id", "text", n = 3, d)
      intercept[IllegalArgumentException] {
        Dedup.appendGramIndex(spark, d, changed, "doc_id", "text")
      }
      // a SHRUNK gram set (text truncated) must also refuse — the
      // both-directions check
      intercept[IllegalArgumentException] {
        Dedup.appendGramIndex(spark, d,
          Seq((1L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text")
      }
      Dedup.appendGramIndex(spark, d, same, "doc_id", "text")
    }
    locally {
      val d = tmp("winnow_mut")
      Dedup.writeWinnowIndex(orig, "doc_id", "text", k = 3, w = 2, d)
      intercept[IllegalArgumentException] {
        Dedup.appendWinnowIndex(spark, d, changed, "doc_id", "text")
      }
      Dedup.appendWinnowIndex(spark, d, same, "doc_id", "text")
    }
  }

  test("D113 delete keeps shared grams: a gram also in a survivor keeps flagging after the owner is deleted") {
    // doc 0 and doc 2 share "x y z"; doc 0 alone has "u v w".
    val corpus = Seq(
      (0L, "x y z u v w"),
      (2L, "x y z p q r")).toDF("doc_id", "text")
    val d = tmp("gram_shared")
    Dedup.writeGramIndex(corpus, "doc_id", "text", n = 3, d)
    Dedup.removeDocsFromGramIndex(spark, d,
      Seq(0L).toDF("doc_id"), "doc_id")
    val probe = Seq((11L, "x y z"), (13L, "u v w")).toDF("doc_id", "text")
    def report(dir: String) =
      Dedup.incrementalDuplicatedSpans(spark, dir, probe, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("dup_ngrams")).toMap
    val got = report(d)
    assert(got(11L) === 1L, "gram shared with surviving doc 2 must keep flagging")
    assert(got(13L) === 0L, "gram unique to deleted doc 0 must stop flagging")
    // compact preserves the same answer with tombstones folded
    Dedup.compactGramIndex(spark, d)
    assert(report(d) === got)
    assert(!new java.io.File(s"$d/tombstones").exists())
  }

  test("D55 delete: text-index search equals from-scratch over survivors; compact recomputes stats; append refuses pending ids") {
    import graft.operators.TextIndex
    val all = docs.limit(60).localCheckpoint()
    val removed = all.filter(col("doc_id") % 3 === 0)
    val survivors = all.filter(col("doc_id") % 3 =!= 0)
    val terms = Seq("join", "scan", "window")
    def res(dir: String) =
      TextIndex.searchSaturationExact(spark, dir, terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d = tmp("text_rm")
    TextIndex.writeIndex(all, "doc_id", "text", d)
    TextIndex.removeDocs(spark, d, removed.select("doc_id"), "doc_id")
    val fresh = tmp("text_fresh")
    TextIndex.writeIndex(survivors, "doc_id", "text", fresh)
    assert(res(d) === res(fresh),
      "tombstone-adjusted search must equal from-scratch over survivors")
    intercept[IllegalArgumentException] {
      TextIndex.appendIndex(removed.limit(1), "doc_id", "text", d)
    }
    TextIndex.compactIndex(spark, d)
    assert(!new java.io.File(s"$d/tombstones").exists())
    assert(res(d) === res(fresh))
    // stats recomputed exactly
    val sd = spark.read.parquet(s"$d/stats").head()
    val sf2 = spark.read.parquet(s"$fresh/stats").head()
    assert((sd.getLong(0), sd.getLong(1)) === ((sf2.getLong(0), sf2.getLong(1))))
    // after compact the removed docs re-append cleanly
    TextIndex.appendIndex(removed, "doc_id", "text", d)
    val fullIdx = tmp("text_full")
    TextIndex.writeIndex(all, "doc_id", "text", fullIdx)
    assert(res(d) === res(fullIdx))
  }

  // --- crash-window recovery (round 14) ------------------------------

  private def rmrfDir(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.walk(path).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
  }

  private def cpDir(src: String, dst: String): Unit = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Paths.get(src)
    java.nio.file.Files.walk(s).iterator().asScala.foreach { p =>
      val t = java.nio.file.Paths.get(dst).resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
  }

  test("D55 compact crash between delete(live) and rename: next read republishes staging instead of destroying the index") {
    import graft.operators.TextIndex
    val all = docs.limit(60).localCheckpoint()
    val removed = all.filter(col("doc_id") % 3 === 0)
    val survivors = all.filter(col("doc_id") % 3 =!= 0)
    val terms = Seq("join", "scan", "window")
    def res(dir: String) =
      TextIndex.searchSaturationExact(spark, dir, terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d = tmp("text_crash_mid")
    TextIndex.writeIndex(all, "doc_id", "text", d)
    TextIndex.removeDocs(spark, d, removed.select("doc_id"), "doc_id")
    // simulate compactIndex dying between delete(live) and
    // rename(staging, live): a COMPLETE survivor staging (Spark wrote
    // its _SUCCESS), live gone, tombstones + old stats still present
    spark.read.parquet(s"$d/postings")
      .join(broadcast(removed.select("doc_id")), Seq("doc_id"), "left_anti")
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(s"$d/postings__staging")
    rmrfDir(s"$d/postings")
    val fresh = tmp("text_crash_fresh")
    TextIndex.writeIndex(survivors, "doc_id", "text", fresh)
    // the next read repairs (republish) and scores survivor-exact
    assert(res(d) === res(fresh),
      "search after a mid-publish crash must recover the staged postings")
    assert(new java.io.File(s"$d/postings").exists())
    assert(!new java.io.File(s"$d/postings__staging").exists())
    // and the next compact folds cleanly on top
    TextIndex.compactIndex(spark, d)
    assert(res(d) === res(fresh))
    // an INCOMPLETE staging (no _SUCCESS: writer died mid-write) next
    // to an intact live: READS ignore it (never delete — it could be
    // an in-flight compact's write in another process); the next
    // WRITER op discards it
    val d2 = tmp("text_crash_incomplete")
    TextIndex.writeIndex(all, "doc_id", "text", d2)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$d2/postings__staging"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d2/postings__staging/part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    val fullIdx = tmp("text_crash_full")
    TextIndex.writeIndex(all, "doc_id", "text", fullIdx)
    assert(res(d2) === res(fullIdx))
    assert(new java.io.File(s"$d2/postings__staging").exists(),
      "a read must not delete a maybe-in-flight staging")
    TextIndex.removeDocs(spark, d2, all.limit(0).select("doc_id"), "doc_id")
    assert(!new java.io.File(s"$d2/postings__staging").exists(),
      "the next writer op discards the crash residue")
  }

  test("D55 compact crash after stats swap, before tombstone drop: stale tombstones are never double-subtracted") {
    import graft.operators.TextIndex
    val all = docs.limit(60).localCheckpoint()
    val removed = all.filter(col("doc_id") % 3 === 0)
    val survivors = all.filter(col("doc_id") % 3 =!= 0)
    val terms = Seq("join", "scan", "window")
    def res(dir: String) =
      TextIndex.searchSaturationExact(spark, dir, terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d = tmp("text_crash_stale")
    TextIndex.writeIndex(all, "doc_id", "text", d)
    TextIndex.removeDocs(spark, d, removed.select("doc_id"), "doc_id")
    // stash the tombstones, compact fully, then restore them — the
    // exact state a crash between publishStats and delete(tombstones)
    // leaves behind (postings rewritten, stats survivor-exact at
    // gen+1, folded gen-0 tombstones still on disk)
    val stash = tmp("text_crash_stash")
    cpDir(s"$d/tombstones", stash)
    TextIndex.compactIndex(spark, d)
    cpDir(stash, s"$d/tombstones")
    val fresh = tmp("text_stale_fresh")
    TextIndex.writeIndex(survivors, "doc_id", "text", fresh)
    assert(res(d) === res(fresh),
      "stale (already-folded) tombstones must not skew idf/avgdl")
    // re-appending a doc whose delete was already folded is legal —
    // its postings are physically gone
    TextIndex.appendIndex(removed, "doc_id", "text", d)
    val fullIdx = tmp("text_stale_full")
    TextIndex.writeIndex(all, "doc_id", "text", fullIdx)
    assert(res(d) === res(fullIdx))
    // ...and RE-DELETING a re-appended doc works: the stale rows were
    // cleared, not treated as "already tombstoned"
    TextIndex.removeDocs(spark, d, removed.select("doc_id"), "doc_id")
    assert(res(d) === res(fresh))
  }

  test("D55 legacy (pre-gen) tombstones mixed with gen-stamped appends: both vintages stay pending") {
    import graft.operators.TextIndex
    val all = docs.limit(60).localCheckpoint()
    val legacyDel = all.filter(col("doc_id") % 6 === 0)
    val newDel = all.filter(col("doc_id") % 6 === 3)
    val survivors = all.filter(col("doc_id") % 3 =!= 0)
    val terms = Seq("join", "scan", "window")
    def res(dir: String) =
      TextIndex.searchSaturationExact(spark, dir, terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d = tmp("text_legacy_tomb")
    TextIndex.writeIndex(all, "doc_id", "text", d)
    TextIndex.removeDocs(spark, d, legacyDel.select("doc_id"), "doc_id")
    // rewrite the tombstone table as the PREVIOUS release wrote it —
    // (doc_id, len) only, no gen column
    val legacyRows = spark.read.parquet(s"$d/tombstones")
      .select("doc_id", "len").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    rmrfDir(s"$d/tombstones")
    import spark.implicits._
    legacyRows.toDF("doc_id", "len")
      .coalesce(1).write.parquet(s"$d/tombstones")
    // a new-release delete APPENDS gen-stamped rows into the same dir
    TextIndex.removeDocs(spark, d, newDel.select("doc_id"), "doc_id")
    val fresh = tmp("text_legacy_fresh")
    TextIndex.writeIndex(survivors, "doc_id", "text", fresh)
    assert(res(d) === res(fresh),
      "legacy AND gen-stamped tombstones must both mask (mixed-schema read)")
    // and the fold clears BOTH vintages
    TextIndex.compactIndex(spark, d)
    assert(!new java.io.File(s"$d/tombstones").exists())
    assert(res(d) === res(fresh))
  }

  test("D55 crash between the two stats renames: next read restores the swapped-out row") {
    import graft.operators.TextIndex
    val all = docs.limit(40).localCheckpoint()
    val terms = Seq("join", "scan")
    def res(dir: String) =
      TextIndex.searchSaturationExact(spark, dir, terms)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d = tmp("text_stats_mid")
    TextIndex.writeIndex(all, "doc_id", "text", d)
    val want = res(d)
    // crash state: stats moved to stats_next's slot — i.e. a COMPLETE
    // stats_next exists and stats itself is missing
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$d/stats"), java.nio.file.Paths.get(s"$d/stats_next"))
    assert(res(d) === want, "recovery must republish the complete stats_next")
    assert(new java.io.File(s"$d/stats").exists())
    // crash state: stats renamed aside to stats_old, stats_next already
    // consumed — only the restore path can bring stats back
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$d/stats"), java.nio.file.Paths.get(s"$d/stats_old"))
    assert(res(d) === want, "recovery must restore stats from stats_old")
    assert(!new java.io.File(s"$d/stats_old").exists())
  }

  test("D58 append after a crashed compact publish: the staged fold is finished first, the batch survives the next compact") {
    val a = docs.filter(col("doc_id") % 4 === 0).limit(40).localCheckpoint()
    val b = docs.filter(col("doc_id") % 4 === 2).limit(40).localCheckpoint()
    val removed = a.filter(col("doc_id") % 8 === 0)
    val probe = docs.filter(col("doc_id") % 2 === 1)
    def pairs(dir: String) =
      Dedup.incrementalNearDup(spark, dir, probe, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d = tmp("sig_crash_append")
    Dedup.writeSignatureIndex(a, "doc_id", "text", d, 3, 12, 4)
    Dedup.removeDocsFromSignatureIndex(spark, d, removed.select("doc_id"), "doc_id")
    // simulate compactSignatureIndex dying AFTER its complete staging
    // write but BEFORE the swap: live still has all rows, staging has
    // the survivors, tombstones pending
    spark.read.parquet(s"$d/bands")
      .join(broadcast(removed.select("doc_id")), Seq("doc_id"), "left_anti")
      .write.parquet(s"$d/bands__staging")
    // the fixed append finishes the publish BEFORE writing, so the
    // batch lands in the folded table and can never be rolled back
    Dedup.appendSignatureIndex(spark, d, b, "doc_id", "text")
    assert(!new java.io.File(s"$d/bands__staging").exists(),
      "append must finish (not ignore) the crashed publish before writing")
    Dedup.compactSignatureIndex(spark, d)
    // reference: survivors of a plus b, built from scratch
    val fresh = tmp("sig_crash_fresh")
    Dedup.writeSignatureIndex(
      a.join(removed.select("doc_id"), Seq("doc_id"), "left_anti").unionByName(b),
      "doc_id", "text", fresh, 3, 12, 4)
    assert(pairs(d) === pairs(fresh),
      "the appended batch must survive the compact that follows a crashed publish")
    assert(spark.read.parquet(s"$d/bands").count() ===
      spark.read.parquet(s"$fresh/bands").count())
  }

  test("rebuild over crashed-maintenance residue: stale staging/journal/tombstones never clobber the fresh index") {
    import graft.operators.{Similarity, TextIndex}
    // --- text index: a COMPLETE stale staging + stale tombstones in
    // the dir; writeIndex must discard both, or the next read's
    // recovery republishes the old postings over the new build and
    // the stale tombstones mask live docs
    val docs0 = docs.limit(50).localCheckpoint()
    val oldHalf = docs0.filter(col("doc_id") % 2 === 0)
    val d = tmp("text_rebuild")
    TextIndex.writeIndex(oldHalf, "doc_id", "text", d)
    TextIndex.removeDocs(spark, d,
      oldHalf.filter(col("doc_id") % 4 === 0).select("doc_id"), "doc_id")
    // fake a crashed compact: complete survivor staging beside live
    spark.read.parquet(s"$d/postings").limit(10)
      .write.partitionBy("bucket").parquet(s"$d/postings__staging")
    TextIndex.writeIndex(docs0, "doc_id", "text", d) // REBUILD over residue
    val fresh = tmp("text_rebuild_fresh")
    TextIndex.writeIndex(docs0, "doc_id", "text", fresh)
    def res(dir: String) =
      TextIndex.searchSaturationExact(spark, dir, Seq("join", "scan"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(res(d) === res(fresh),
      "rebuild must discard stale staging + tombstones")
    assert(!new java.io.File(s"$d/tombstones").exists())

    // --- IVF: a COMMITTED stale journal + delta in the dir; a
    // rebuild must discard them, or the next probe's recovery
    // re-applies the old delete's cell swaps over the fresh cells
    val emb = Tables(spark, sf, "embeddings").localCheckpoint()
    val queries = emb.filter(col("vec_id") < 5)
    def probe(dir: String) =
      Similarity.knnIvfIndexed(spark, dir, queries, "vec_id", "embedding",
          k = 3, nProbe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val iv = tmp("ivf_rebuild")
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 8, dir = iv)
    // fake crashed-delete residue: a committed journal claiming cell 0
    // was emptied, plus a complete (empty-of-cells) delta dir
    spark.read.parquet(s"$iv/corpus").limit(0)
      .write.partitionBy("cell").parquet(s"$iv/corpus__delta")
    import spark.implicits._
    Seq((0, true)).toDF("cell", "emptied")
      .coalesce(1).write.parquet(s"$iv/corpus__commit")
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 8, dir = iv) // REBUILD
    val ivFresh = tmp("ivf_rebuild_fresh")
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 8, dir = ivFresh)
    assert(probe(iv) === probe(ivFresh),
      "rebuild must discard the stale journal — cell 0 must survive")
    assert(new java.io.File(s"$iv/corpus/cell=0").exists())
  }

  test("D7++ staged cell delete: a crash between two cell commits repairs to OLD or NEW, never a mix") {
    import graft.operators.Similarity
    val emb = Tables(spark, sf, "embeddings").localCheckpoint()
    val queries = emb.filter(col("vec_id") < 6)
    def probe(dir: String) =
      Similarity.knnIvfIndexed(spark, dir, queries, "vec_id", "embedding",
          k = 3, nProbe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def build(dir: String): Unit =
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 8, dir = dir)
    // the delete set: empty out one whole cell AND thin another, so
    // the journal carries both an emptied and a rewritten entry
    val ref = tmp("ivf_crash_ref")
    build(ref)
    val byCell = spark.read.parquet(s"$ref/corpus").select("cid", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val (emptyCell, emptyIds) = byCell.minBy(_._2.size)
    val otherCell = byCell.keys.filter(_ != emptyCell).max
    val delIds = (emptyIds :+ byCell(otherCell).min).toDF("cid")
    val oldRes = probe(ref)
    Similarity.removeDocsFromIvfIndex(spark, ref, delIds, "cid")
    val newRes = probe(ref)
    assert(oldRes !== newRes, "fixture must actually change the probe result")

    // replay deleteIds up to its crash point on a fresh twin: delta +
    // journal committed, then ONE cell applied (the emptied one) and
    // the other still un-applied — "between two cell commits"
    def stageCrash(dir: String): Unit = {
      build(dir)
      val live = spark.read.parquet(s"$dir/corpus")
      val touched = Seq(emptyCell, otherCell).sorted
      val survivors = live
        .filter(col("cell").isin(touched.map(Integer.valueOf): _*))
        .join(broadcast(delIds), Seq("cid"), "left_anti").localCheckpoint()
      survivors.write.partitionBy("cell").parquet(s"$dir/corpus__delta")
      val surviving = survivors.select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      import spark.implicits._
      touched.map(c => (c, !surviving.contains(c))).toDF("cell", "emptied")
        .coalesce(1).write.parquet(s"$dir/corpus__commit")
      // first cell commit: drop the emptied cell's live dir
      rmrfDir(s"$dir/corpus/cell=$emptyCell")
      // CRASH here — otherCell's swap never happens
    }
    val crashed = tmp("ivf_crash_mid")
    stageCrash(crashed)
    // the next probe repairs forward to exactly the post-delete index
    assert(probe(crashed) === newRes,
      "a committed journal must be re-applied to the END before any probe")
    assert(!new java.io.File(s"$crashed/corpus__commit").exists())
    assert(!new java.io.File(s"$crashed/corpus__delta").exists())
    assert(!new java.io.File(s"$crashed/corpus/cell=$emptyCell").exists())

    // crash BEFORE the journal's commit point (delta complete, no
    // journal): probes see the OLD index bit-for-bit and leave the
    // delta alone (it could be an in-flight delete's write in
    // another process); the next WRITER op rolls it back
    val early = tmp("ivf_crash_early")
    build(early)
    spark.read.parquet(s"$early/corpus")
      .filter(col("cell").isin(Seq(emptyCell, otherCell).map(Integer.valueOf): _*))
      .join(broadcast(delIds), Seq("cid"), "left_anti").localCheckpoint()
      .write.partitionBy("cell").parquet(s"$early/corpus__delta")
    assert(probe(early) === oldRes,
      "an uncommitted staging must not be visible — the probe sees the OLD index")
    assert(new java.io.File(s"$early/corpus__delta").exists(),
      "a read must not roll back a maybe-in-flight delta")
    // the next delete (a writer) rolls the residue back, then lands
    Similarity.removeDocsFromIvfIndex(spark, early, delIds, "cid")
    assert(!new java.io.File(s"$early/corpus__delta").exists())
    assert(probe(early) === newRes)
  }

  test("D7+++ staged cell delete (IVF-PQ): crash-repair to old or new, ADC probes stay exact") {
    import graft.operators.Pq
    val emb = Tables(spark, sf, "embeddings").localCheckpoint()
    val queries = emb.filter(col("vec_id") < 4)
    def probe(dir: String) =
      Pq.searchIvfPq(spark, dir, queries, "vec_id", "embedding", k = 3, nProbe = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val d = tmp("ivfpq_crash")
    Pq.writeIvfPqIndex(emb, "vec_id", "embedding", nLists = 6, m = 4, ksub = 8, dir = d)
    val oldRes = probe(d)
    // delete returned neighbors — guarantees the probe result changes
    val victim = oldRes.map(_._2).toSeq.distinct.sorted.take(3).toDF("cid")
    // stage a COMPLETE delta+journal by hand, apply nothing (crash at
    // the commit point itself), and let the probe finish the publish
    val live = spark.read.parquet(s"$d/codes")
    val touched = live.select("cid", "cell").join(broadcast(victim), Seq("cid"), "left_semi")
      .select("cell").distinct().collect().map(_.getInt(0)).toSeq.sorted
    val survivors = live.filter(col("cell").isin(touched.map(Integer.valueOf): _*))
      .join(broadcast(victim), Seq("cid"), "left_anti").localCheckpoint()
    survivors.write.partitionBy("cell").parquet(s"$d/codes__delta")
    val surviving = survivors.select("cell").distinct().collect().map(_.getInt(0)).toSet
    import spark.implicits._
    touched.map(c => (c, !surviving.contains(c))).toDF("cell", "emptied")
      .coalesce(1).write.parquet(s"$d/codes__commit")
    val got = probe(d)
    assert(!new java.io.File(s"$d/codes__commit").exists())
    // reference: the same delete applied the normal way on a twin dir
    val ref = tmp("ivfpq_crash_ref")
    Pq.writeIvfPqIndex(emb, "vec_id", "embedding", nLists = 6, m = 4, ksub = 8, dir = ref)
    Pq.removeDocsFromIvfPqIndex(spark, ref, victim, "cid")
    assert(got === probe(ref), "repair-forward must equal the clean delete")
    assert(got !== oldRes, "fixture must actually change the probe result")
  }

  test("D7++ delete: IVF partition rewrite drops emptied cells, leaves untouched cells' files alone") {
    import graft.operators.Similarity
    val emb = Tables(spark, sf, "embeddings")
    val d = tmp("ivf_rm")
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 8, dir = d)
    val before = spark.read.parquet(s"$d/corpus")
      .select("cid", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // delete every vector of ONE cell (forces the emptied-cell branch)
    // plus one vector of another (touched-rewrite branch)
    val cells = before.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val (emptyCell, emptyIds) = cells.minBy(_._2.size)
    val otherCell = cells.keys.filter(_ != emptyCell).head
    val partialId = cells(otherCell).min
    val untouched = cells.keys.filterNot(c => c == emptyCell || c == otherCell)
    val untouchedFiles = untouched.map { c =>
      c -> new java.io.File(s"$d/corpus/cell=$c").listFiles().map(_.getName).toSet
    }.toMap
    Similarity.removeDocsFromIvfIndex(spark, d,
      (emptyIds :+ partialId).toDF("vec_id"), "vec_id")
    assert(!new java.io.File(s"$d/corpus/cell=$emptyCell").exists(),
      "fully-emptied cell directory must be dropped")
    val after = spark.read.parquet(s"$d/corpus")
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(after === before.keySet -- emptyIds - partialId)
    untouchedFiles.foreach { case (c, files) =>
      assert(new java.io.File(s"$d/corpus/cell=$c").listFiles().map(_.getName).toSet === files,
        s"cell $c had no deleted ids and must not be rewritten")
    }
    // idempotent: removing the same (now absent) ids is a no-op
    Similarity.removeDocsFromIvfIndex(spark, d,
      (emptyIds :+ partialId).toDF("vec_id"), "vec_id")
    assert(spark.read.parquet(s"$d/corpus").count().toInt === after.size)
  }

  // --- round 15: exhaustive crash-prefix fuzz + maintenance lease ----

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("journal apply crash fuzz: EVERY prefix of the step list recovers to the NEW index") {
    import graft.operators.{CellCommit, Similarity}
    val emb = Tables(spark, sf, "embeddings").localCheckpoint()
    val queries = emb.filter(col("vec_id") < 6)
    def probe(dir: String) =
      Similarity.knnIvfIndexed(spark, dir, queries, "vec_id", "embedding",
          k = 3, nProbe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: build once, delete (empty one cell + thin another),
    // record the post-delete truth
    val ref = tmp("fuzz_ref")
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", nLists = 8, dir = ref)
    val byCell = spark.read.parquet(s"$ref/corpus").select("cid", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap
    val (emptyCell, emptyIds) = byCell.minBy(_._2.size)
    val otherCell = byCell.keys.filter(_ != emptyCell).max
    val delIds = (emptyIds :+ byCell(otherCell).min).toDF("cid")
    val oldRes = probe(ref)
    // the crashed-state template: delta written, journal COMMITTED,
    // nothing applied yet (deleteIds halted at its commit point)
    val template = tmp("fuzz_template")
    copyDir(ref, template)
    locally {
      val live = spark.read.parquet(s"$template/corpus")
      val touched = Seq(emptyCell, otherCell).sorted
      val survivors = live
        .filter(col("cell").isin(touched.map(Integer.valueOf): _*))
        .join(broadcast(delIds), Seq("cid"), "left_anti").localCheckpoint()
      survivors.write.partitionBy("cell").parquet(s"$template/corpus__delta")
      val surviving = survivors.select("cell").distinct()
        .collect().map(_.getInt(0)).toSet
      touched.map(c => (c, !surviving.contains(c))).toDF("cell", "emptied")
        .coalesce(1).write.parquet(s"$template/corpus__commit")
    }
    // finish the reference so we know the NEW truth
    Similarity.removeDocsFromIvfIndex(spark, ref, delIds, "cid")
    val newRes = probe(ref)
    assert(oldRes !== newRes, "fixture must actually change the probe result")
    // the step list from the committed state (emptied cell has 1
    // step, rewritten cell 2, plus journal+delta drops = 5 steps)
    val nSteps = CellCommit.applyJournalSteps(spark, s"$template/corpus").size
    assert(nSteps >= 5, s"expected a multi-step protocol, got $nSteps")
    // kill at EVERY prefix: each twin executes the first k steps then
    // "crashes"; the probe-side recovery must land on exactly NEW (the
    // journal is committed — old is no longer reachable) with all
    // residue gone
    (0 to nSteps).foreach { k =>
      val twin = tmp(s"fuzz_k$k")
      copyDir(template, twin)
      val steps = CellCommit.applyJournalSteps(spark, s"$twin/corpus")
      assert(steps.size === nSteps, s"prefix $k: step list drifted")
      steps.take(k).foreach(_.run())
      assert(probe(twin) === newRes,
        s"crash after ${if (k == 0) "no steps" else s"step $k (${steps(k - 1).desc})"}: " +
          "recovery must reach the NEW index")
      // a probe never rolls anything back, so post-journal-drop
      // prefixes can leave a dead delta dir behind; the next WRITER
      // op clears every residue
      CellCommit.recover(spark, s"$twin/corpus")
      assert(probe(twin) === newRes, s"prefix $k: writer recovery changed the result")
      assert(!new java.io.File(s"$twin/corpus__commit").exists(),
        s"prefix $k: journal residue survived recovery")
      assert(!new java.io.File(s"$twin/corpus__delta").exists(),
        s"prefix $k: delta residue survived recovery")
      rmrfDir(twin)
    }
  }

  test("flat staged publish crash fuzz: every prefix of [delete live, rename staging] lands on OLD or NEW") {
    import graft.operators.CellCommit
    import spark.implicits._
    // the flat protocol's full step list from a COMPLETE staging:
    //   0: nothing ran  -> probes serve OLD; the next writer publishes
    //   1: live deleted -> probes republish the staging (NEW)
    //   2: renamed      -> NEW, staging gone
    (0 to 2).foreach { k =>
      val base = tmp(s"flat_fuzz_$k")
      val live = s"$base/rows"
      Seq(("v1", 1L)).toDF("tag", "n").write.parquet(live)
      Seq(("v2", 2L)).toDF("tag", "n").write.parquet(s"${live}__staging")
      if (k >= 1) rmrfDir(live)
      if (k >= 2) {
        assert(new java.io.File(s"${live}__staging").renameTo(new java.io.File(live)))
      }
      // probe-side repair first: it must never see a missing table,
      // and must never roll a complete staging back
      CellCommit.repairMissingLive(spark, live)
      val seen = spark.read.parquet(live).select("tag").head().getString(0)
      val expected = if (k == 0) "v1" else "v2"
      assert(seen === expected, s"prefix $k: probe read $seen")
      // writer-side recovery finishes the publish whatever the prefix
      CellCommit.recoverStagedPublish(spark, live)
      assert(spark.read.parquet(live).select("tag").head().getString(0) === "v2",
        s"prefix $k: writer recovery must land on NEW")
      assert(!new java.io.File(s"${live}__staging").exists(),
        s"prefix $k: staging residue survived recovery")
    }
  }

  test("maintenance lease: second maintainer refuses while held, entry points wait, stale owners reclaimed") {
    import graft.operators.{CellCommit, Sketches}
    val spark2 = spark
    val dir = tmp("lease_basic")
    // held lease: a direct second acquire refuses, naming the holder
    val lease = CellCommit.acquireLease(spark2, dir, staleMs = 60000L, waitMs = 400L)
    val ex = intercept[IllegalStateException] {
      CellCommit.acquireLease(spark2, dir, staleMs = 60000L, waitMs = 400L)
    }
    assert(ex.getMessage.contains("owner="), ex.getMessage)
    assert(ex.getMessage.contains("single-writer"), ex.getMessage)
    // a REAL maintainer entry point (writeKmvShard) WAITS for the
    // holder instead of failing — release from another thread after
    // ~700 ms, the maintainer proceeds
    val releaser = new Thread(() => { Thread.sleep(700); lease.release() })
    val df = Seq(("a", "u1"), ("a", "u2"), ("b", "u3")).toDF("g", "v")
    val t0 = System.nanoTime()
    releaser.start()
    Sketches.writeKmvShard(df, "g", "v", 16, dir, "s1")
    val waitedMs = (System.nanoTime() - t0) / 1e6
    releaser.join()
    assert(waitedMs >= 500,
      f"maintainer must wait for the held lease (waited $waitedMs%.0f ms)")
    assert(spark2.read.parquet(s"$dir/rows").count() === 3)
    assert(!new java.io.File(s"${dir}__lease").exists(),
      "lease must be released after the maintainer finishes")
    // stale lease (dead owner, no heartbeat): reclaimed instead of
    // blocking forever
    val dir2 = tmp("lease_stale")
    val staleF = new java.io.File(s"${dir2}__lease")
    staleF.getParentFile.mkdirs()
    java.nio.file.Files.write(staleF.toPath,
      "owner=dead@nowhere/0\nepoch=0\n".getBytes("UTF-8"))
    staleF.setLastModified(System.currentTimeMillis() - 3600000L)
    val l2 = CellCommit.acquireLease(spark2, dir2, staleMs = 1000L, waitMs = 2000L)
    l2.release()
    assert(!staleF.exists(), "stale lease must be reclaimed and replaced")
    // reentrancy is EXACT-KEY: nested same-dir scopes share one
    // acquisition, but a CHILD table path acquires its own lease —
    // the table lease file must exist while the table is mutated,
    // because probes in other JVMs contend on the table path, not the
    // family dir (the round-15 self-review's top finding)
    val dir3 = tmp("lease_reentrant")
    val got = CellCommit.withMaintenanceLease(spark2, dir3) {
      CellCommit.withMaintenanceLease(spark2, dir3, waitMs = 300L) {
        CellCommit.withMaintenanceLease(spark2, s"$dir3/corpus", waitMs = 300L) {
          assert(new java.io.File(s"$dir3/corpus__lease").exists(),
            "nested table scope must create the table-path lease probes contend on")
          42
        }
      }
    }
    assert(got === 42)
    assert(!new java.io.File(s"${dir3}__lease").exists())
    assert(!new java.io.File(s"$dir3/corpus__lease").exists())
    // regression for the review finding: holding the TABLE lease (a
    // probe mid-repair in another process) must block a maintainer's
    // nested table mutation even though the maintainer holds the
    // family-dir lease
    val dir4 = tmp("lease_table_contention")
    val probeLease = CellCommit.acquireLease(spark2, s"$dir4/corpus",
      staleMs = 60000L, waitMs = 400L)
    try {
      intercept[IllegalStateException] {
        CellCommit.withMaintenanceLease(spark2, dir4) {
          CellCommit.withMaintenanceLease(spark2, s"$dir4/corpus", waitMs = 400L) {
            fail("table mutation must not proceed under another process' table lease")
          }
        }
      }
    } finally probeLease.release()
  }

  // --- round 16: the lease's zombie/release/torn-create edges --------

  test("zombie fence: a stale-reclaimed holder aborts at its next destructive step instead of mutating") {
    import graft.operators.CellCommit
    val base = tmp("zombie")
    val live = s"$base/rows"
    Seq(("old", 1L)).toDF("tag", "n").write.parquet(live)
    Seq(("new", 2L)).toDF("tag", "n").write.parquet(s"${live}__staging")
    CellCommit.withMaintenanceLease(spark, live, staleMs = 1000L, waitMs = 500L) {
      val zombie = CellCommit.heldLeaseForTest(live).get
      // simulate a stop-the-world pause past the stale horizon: the
      // heartbeat stops advancing the lease mtime while the protocol
      // thread stays runnable
      CellCommit.suspendHeartbeatForTest(zombie)
      assert(new java.io.File(s"${live}__lease")
        .setLastModified(System.currentTimeMillis() - 10000L))
      // a second maintainer reclaims the stale lease and re-acquires
      val reclaimer = CellCommit.acquireLease(spark, live, staleMs = 1000L, waitMs = 2000L)
      try {
        // the resumed zombie's next destructive step must abort via
        // the SYNCHRONOUS fence (its heartbeat thread is suspended, so
        // only the on-disk re-read can catch the loss) without
        // touching live or staging
        val ex = intercept[IllegalStateException] {
          CellCommit.publishStaged(spark, live)
        }
        assert(ex.getMessage.contains("lost"), ex.getMessage)
        assert(spark.read.parquet(live).select("tag").head().getString(0) === "old",
          "zombie must not have deleted the live table")
        assert(new java.io.File(s"${live}__staging").exists(),
          "zombie must not have consumed the staging")
      } finally reclaimer.release()
    }
    // the state recovers: the next maintainer entry finishes the publish
    CellCommit.recoverStagedPublish(spark, live)
    assert(spark.read.parquet(live).select("tag").head().getString(0) === "new")
  }

  test("zombie fence is most-specific: a live family-dir lease must not mask a reclaimed table lease") {
    import graft.operators.CellCommit
    val family = tmp("zombie_nested")
    val table = s"$family/corpus"
    Seq(("old", 1L)).toDF("tag", "n").write.parquet(table)
    Seq(("new", 2L)).toDF("tag", "n").write.parquet(s"${table}__staging")
    CellCommit.withMaintenanceLease(spark, family) {
      CellCommit.withMaintenanceLease(spark, table, staleMs = 1000L, waitMs = 500L) {
        val tl = CellCommit.heldLeaseForTest(table).get
        CellCommit.suspendHeartbeatForTest(tl)
        assert(new java.io.File(s"${table}__lease")
          .setLastModified(System.currentTimeMillis() - 10000L))
        val reclaimer = CellCommit.acquireLease(spark, table, staleMs = 1000L, waitMs = 2000L)
        try {
          // the family-dir lease is still perfectly live (probes never
          // contend on it, so it is never reclaimed) — before the
          // round-16 fix its liveness masked the reclaimed TABLE lease
          // (forall(_.lost) read false) and the zombie kept mutating
          // interleaved with the reclaimer
          intercept[IllegalStateException] {
            CellCommit.publishStaged(spark, table)
          }
          assert(spark.read.parquet(table).select("tag").head().getString(0) === "old",
            "zombie must not have deleted the table under a live ancestor lease")
        } finally reclaimer.release()
      }
    }
  }

  test("torn lease create self-heals: an ownerless lease file is reclaimed without waiting out the stale horizon") {
    import graft.operators.CellCommit
    val dir = tmp("lease_torn")
    val f = new java.io.File(s"${dir}__lease")
    f.getParentFile.mkdirs()
    // zero-byte file: createNewFile ran, the payload write crashed —
    // owned by NOBODY, heartbeat never advances its mtime
    java.nio.file.Files.write(f.toPath, Array.emptyByteArray)
    assert(f.setLastModified(System.currentTimeMillis() - 2000L)) // past the grace, far inside the horizon
    val t0 = System.nanoTime()
    val l = CellCommit.acquireLease(spark, dir, staleMs = 3600000L, waitMs = 5000L)
    val tookMs = (System.nanoTime() - t0) / 1e6
    l.release()
    assert(tookMs < 4000, f"ownerless lease must be reclaimed promptly, took $tookMs%.0f ms")
    assert(!f.exists())
  }

  test("release never deletes a successor's lease: a reclaimed-then-reacquired path survives the old holder's release") {
    import graft.operators.CellCommit
    val dir = tmp("lease_release")
    val l1 = CellCommit.acquireLease(spark, dir, staleMs = 60000L, waitMs = 400L)
    // simulate reclaim + re-acquire while l1's JVM was paused: the
    // on-disk lease now belongs to a successor
    val f = new java.io.File(s"${dir}__lease")
    val successor = "owner=successor@elsewhere/1\nepoch=1\n"
    java.nio.file.Files.write(f.toPath, successor.getBytes("UTF-8"))
    l1.release()
    assert(f.exists(), "release must not delete the successor's lease")
    assert(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8") === successor)
    // the verify-and-put-back must leave no aside residue either
    val residue = f.getParentFile.listFiles()
      .filter(_.getName.contains("__lease.release"))
    assert(residue.isEmpty, s"release left aside residue: ${residue.mkString(",")}")
    java.nio.file.Files.delete(f.toPath)
  }

  test("reclaim arbiter never destroys a successor's fresh lease (mtime re-verify after rename-aside)") {
    import graft.operators.CellCommit
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    // case 1: the renamed file IS the observed corpse — reclaimed
    val dir1 = tmp("arbiter_corpse")
    val f1 = new java.io.File(s"${dir1}__lease")
    f1.getParentFile.mkdirs()
    java.nio.file.Files.write(f1.toPath, "owner=dead@x/0\nepoch=0\n".getBytes("UTF-8"))
    val staleMtime = System.currentTimeMillis() - 3600000L
    assert(f1.setLastModified(staleMtime))
    assert(CellCommit.reclaimObservedStale(fs,
      new org.apache.hadoop.fs.Path(f1.toURI), dir1, f1.lastModified()))
    assert(!f1.exists(), "the observed corpse must be reclaimed")
    // case 2: between the staleness read and the rename, another
    // reclaimer won and a NEW holder created a fresh lease at the
    // path — the arbiter must put the successor's lease back intact
    // instead of deleting it (the round-16 review's top finding)
    val dir2 = tmp("arbiter_successor")
    val f2 = new java.io.File(s"${dir2}__lease")
    f2.getParentFile.mkdirs()
    val successor = "owner=successor@elsewhere/1\nepoch=1\n"
    java.nio.file.Files.write(f2.toPath, successor.getBytes("UTF-8"))
    // observedMtime is the OLD corpse's — differs from the fresh file
    assert(!CellCommit.reclaimObservedStale(fs,
      new org.apache.hadoop.fs.Path(f2.toURI), dir2, staleMtime))
    assert(f2.exists(), "the successor's fresh lease must survive the arbiter")
    assert(new String(java.nio.file.Files.readAllBytes(f2.toPath), "UTF-8") === successor)
    val residue = f2.getParentFile.listFiles().filter(_.getName.contains("__lease.reclaim"))
    assert(residue.isEmpty, s"arbiter left aside residue: ${residue.mkString(",")}")
    java.nio.file.Files.delete(f2.toPath)
  }

  test("no-replace put-back: an occupied lease path is never overwritten (POSIX rename would)") {
    import graft.operators.CellCommit
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val base = tmp("rename_noreplace")
    new java.io.File(base).mkdirs()
    val src = new java.io.File(s"$base/aside")
    val dst = new java.io.File(s"$base/lease")
    java.nio.file.Files.write(src.toPath, "owner=displaced@x/1\n".getBytes("UTF-8"))
    // dst absent: the put-back lands with content intact
    assert(CellCommit.renameNoReplace(fs,
      new org.apache.hadoop.fs.Path(src.toURI), new org.apache.hadoop.fs.Path(dst.toURI)))
    assert(!src.exists() && dst.exists())
    assert(new String(java.nio.file.Files.readAllBytes(dst.toPath), "UTF-8")
      .startsWith("owner=displaced"))
    // dst occupied by a third acquirer's fresh lease: the put-back
    // must REFUSE — a plain rename(2) would silently replace it
    val src2 = new java.io.File(s"$base/aside2")
    val third = "owner=third@y/2\n"
    java.nio.file.Files.write(src2.toPath, "owner=older@x/1\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dst.toPath, third.getBytes("UTF-8"))
    assert(!CellCommit.renameNoReplace(fs,
      new org.apache.hadoop.fs.Path(src2.toURI), new org.apache.hadoop.fs.Path(dst.toURI)))
    assert(src2.exists(), "refused put-back must leave the aside for the caller to drop")
    assert(new String(java.nio.file.Files.readAllBytes(dst.toPath), "UTF-8") === third,
      "the third acquirer's lease must survive byte-for-byte")
  }

  test("lease create is atomic with its payload: never observable empty, no tmp residue") {
    import graft.operators.CellCommit
    val dir = tmp("lease_atomic_create")
    val l = CellCommit.acquireLease(spark, dir, staleMs = 60000L, waitMs = 400L)
    try {
      val f = new java.io.File(s"${dir}__lease")
      assert(f.length() > 0, "lease file must carry its owner payload from birth " +
        "(hard-link publish — a zero-byte window would re-open the ownerless-reclaim race)")
      val tmpResidue = f.getParentFile.listFiles().filter(_.getName.contains(".tmp."))
      assert(tmpResidue.isEmpty, s"create left tmp residue: ${tmpResidue.mkString(",")}")
    } finally l.release()
  }

  test("zombie fence covers clearStaged, clearStagedFlat and recoverStagedPublish too") {
    import graft.operators.CellCommit
    def zombify(key: String)(destructive: => Unit): Unit = {
      CellCommit.withMaintenanceLease(spark, key, staleMs = 1000L, waitMs = 500L) {
        val zombie = CellCommit.heldLeaseForTest(key).get
        CellCommit.suspendHeartbeatForTest(zombie)
        assert(new java.io.File(s"${key}__lease")
          .setLastModified(System.currentTimeMillis() - 10000L))
        val reclaimer = CellCommit.acquireLease(spark, key, staleMs = 1000L, waitMs = 2000L)
        try {
          val ex = intercept[IllegalStateException] { destructive }
          assert(ex.getMessage.contains("lost"), ex.getMessage)
        } finally reclaimer.release()
      }
    }
    // clearStaged: journal + delta residue must survive the zombie —
    // before round 16 these three paths ran their deletes unfenced, so
    // a stale-reclaimed holder resuming inside them could still race
    // the reclaimer's journal apply (cell-loss class)
    val t1 = s"${tmp("zombie_clear")}/idx"
    Seq(("x", 1L)).toDF("tag", "n").write.parquet(t1)
    Seq((1, false)).toDF("cell", "emptied").write.parquet(s"${t1}__commit")
    Seq(("d", 1L)).toDF("tag", "n").write.parquet(s"${t1}__delta")
    zombify(t1) { CellCommit.clearStaged(spark, t1) }
    assert(new java.io.File(s"${t1}__commit").exists(), "zombie must not drop the journal")
    assert(new java.io.File(s"${t1}__delta").exists(), "zombie must not drop the delta")
    // clearStagedFlat: a staging dir must survive the zombie
    val t2 = s"${tmp("zombie_flatclear")}/idx"
    Seq(("s", 1L)).toDF("tag", "n").write.parquet(s"${t2}__staging")
    zombify(t2) { CellCommit.clearStagedFlat(spark, t2) }
    assert(new java.io.File(s"${t2}__staging").exists(), "zombie must not drop the staging")
    // recoverStagedPublish: live must not be deleted, staging not consumed
    val t3 = s"${tmp("zombie_recover")}/idx"
    Seq(("old", 1L)).toDF("tag", "n").write.parquet(t3)
    Seq(("new", 2L)).toDF("tag", "n").write.parquet(s"${t3}__staging")
    zombify(t3) { CellCommit.recoverStagedPublish(spark, t3) }
    assert(spark.read.parquet(t3).select("tag").head().getString(0) === "old",
      "zombie must not have deleted the live table")
    assert(new java.io.File(s"${t3}__staging").exists(),
      "zombie must not have consumed the staging")
  }

  test("lease stress: 8 threads contending on one key are mutually exclusive, all eventually enter") {
    import graft.operators.CellCommit
    val dir = tmp("lease_stress")
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val entered = new java.util.concurrent.atomic.AtomicInteger(0)
    val violations = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        try {
          (1 to 3).foreach { _ =>
            // generous patience: 24 holds x ~15 ms serialize well inside it
            CellCommit.withMaintenanceLease(spark, dir, staleMs = 60000L, waitMs = 30000L) {
              if (active.incrementAndGet() != 1) violations.incrementAndGet()
              Thread.sleep(15)
              active.decrementAndGet()
              entered.incrementAndGet()
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"stress errors: ${errors.toArray.mkString(";")}")
    assert(violations.get() === 0,
      "two holders were inside the leased section at once — the single-writer contract broke")
    assert(entered.get() === 24, s"all 24 entries must eventually run, got ${entered.get()}")
    assert(!new java.io.File(s"${dir}__lease").exists(), "last release must clear the lease")
  }

  test("lease stress: a stale corpse under 6 contending reclaimers is collected exactly once") {
    import graft.operators.CellCommit
    val dir = tmp("lease_stress_reclaim")
    val f = new java.io.File(s"${dir}__lease")
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, "owner=dead@x/0\nepoch=0\n".getBytes("UTF-8"))
    assert(f.setLastModified(System.currentTimeMillis() - 3600000L))
    CellCommit.resetLeaseStats()
    val entered = new java.util.concurrent.atomic.AtomicInteger(0)
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val violations = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 6).map { _ =>
      new Thread(() => {
        try {
          CellCommit.withMaintenanceLease(spark, dir, staleMs = 1000L, waitMs = 30000L) {
            if (active.incrementAndGet() != 1) violations.incrementAndGet()
            Thread.sleep(15)
            active.decrementAndGet()
            entered.incrementAndGet()
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"stress errors: ${errors.toArray.mkString(";")}")
    assert(violations.get() === 0)
    assert(entered.get() === 6, s"every contender must eventually enter, got ${entered.get()}")
    // the rename-aside arbitration lets exactly ONE reclaimer collect
    // the corpse; the rest lose the rename (or never see a stale file
    // again) and serialize through the ordinary create race. The
    // counter is JVM-global and suites run in parallel, so assert >=1
    // here; exactly-once arbitration itself is pinned by the
    // reclaim-arbiter unit spec above.
    assert(CellCommit.leaseStats("reclaims") >= 1L,
      s"corpse must be reclaimed: ${CellCommit.leaseStats}")
    assert(!f.exists())
  }

  test("lease contention telemetry counts waits, reclaims, refusals") {
    import graft.operators.CellCommit
    CellCommit.resetLeaseStats()
    val dir = tmp("lease_stats")
    val l = CellCommit.acquireLease(spark, dir, staleMs = 60000L, waitMs = 300L)
    intercept[IllegalStateException] {
      CellCommit.acquireLease(spark, dir, staleMs = 60000L, waitMs = 300L)
    }
    l.release()
    val dir2 = tmp("lease_stats2")
    val f = new java.io.File(s"${dir2}__lease")
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, "owner=dead@x/0\nepoch=0\n".getBytes("UTF-8"))
    f.setLastModified(System.currentTimeMillis() - 3600000L)
    CellCommit.acquireLease(spark, dir2, staleMs = 1000L, waitMs = 2000L).release()
    val s = CellCommit.leaseStats
    assert(s("refusals") >= 1, s.toString)
    assert(s("reclaims") >= 1, s.toString)
    assert(s("waits") >= 1, s.toString)
    assert(s("wait_ms") >= 1, s.toString)
  }
}
