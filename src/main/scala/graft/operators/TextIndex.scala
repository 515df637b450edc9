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

  /** Tokenize once, aggregate (doc, term) frequencies, write postings
    * partitioned by `bucket = pmod(xxhash64(w), nBuckets)` plus the
    * one-row stats table the scorer needs.
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String, nBuckets: Int = 64): Unit = {
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
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Incremental maintenance: index a NEW batch against the stored
    * bucket modulus and append its postings into the same partition
    * layout — no rebuild, no rewrite of existing postings; cost
    * scales with the batch, not the corpus (the IVF-append contract,
    * D7+). The stats row is replaced with the summed scalars
    * (atomically: written to a temp dir first, moved last), because
    * BM25's idf/avgdl must describe the WHOLE corpus after append.
    */
  def appendIndex(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val spark = docs.sparkSession
    // ids with a pending delete are refused (the index-family delete
    // contract): their old postings are still physically present, so
    // un-tombstoning on re-add would resurrect stale rows — compact
    // first, then re-append
    val tombP = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (tombP.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tombP)) {
      val hit = docs.select(col(idCol).as("doc_id")).distinct()
        .join(spark.read.parquet(tombP.toString).select("doc_id").distinct(),
          Seq("doc_id"), "left_semi")
        .limit(5).collect().map(_.get(0)).toSeq
      require(hit.isEmpty,
        s"appendIndex: doc ids ${hit.mkString(", ")} have a pending delete in " +
          s"$dir; compact the index before re-adding them")
    }
    val stats = spark.read.parquet(s"$dir/stats")
      .select("t_total", "n_docs", "n_buckets").head()
    val nBuckets = stats.getInt(2)
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
    val tmp = s"$dir/stats_next"
    spark.range(1).select(
        lit(stats.getLong(0) + batchStats.getLong(0)).as("t_total"),
        lit(stats.getLong(1) + batchStats.getLong(1)).as("n_docs"),
        lit(nBuckets).as("n_buckets"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val target = java.nio.file.Paths.get(dir, "stats")
    val old = java.nio.file.Paths.get(dir, "stats_old")
    java.nio.file.Files.move(target, old)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), target)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(old).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
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
      idCol: String): Unit = {
    val tomb = s"$dir/tombstones"
    val tombP = new org.apache.hadoop.fs.Path(tomb)
    val fs = tombP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // (doc_id, len) of ids actually in the index — column-pruned scan
    val present = spark.read.parquet(s"$dir/postings")
      .select("doc_id", "len").distinct()
      .join(broadcast(ids.select(col(idCol).as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
    val novel =
      if (fs.exists(tombP))
        present.join(spark.read.parquet(tomb).select("doc_id"),
          Seq("doc_id"), "left_anti").localCheckpoint()
      else present
    novel.coalesce(1).write.mode("append").parquet(tomb)
  }

  /** Fold pending tombstones into the physical layout: postings are
    * rewritten minus tombstoned docs (staged beside the live dir,
    * swapped by atomic rename), the stats row is RECOMPUTED from the
    * surviving postings (idempotent — a crash-rerun can never
    * double-subtract), and the tombstone table is dropped last (a
    * crash before the drop leaves no-op tombstones the next compact
    * clears).
    */
  def compactIndex(spark: SparkSession, dir: String): Unit = {
    val tombP = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = tombP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombP)) return
    val live = new org.apache.hadoop.fs.Path(s"$dir/postings")
    val staging = new org.apache.hadoop.fs.Path(s"$dir/postings__staging")
    if (fs.exists(staging)) fs.delete(staging, true) // prior crashed attempt
    val survivors = spark.read.parquet(live.toString)
      .join(broadcast(spark.read.parquet(tombP.toString).select("doc_id").distinct()),
        Seq("doc_id"), "left_anti")
    survivors.repartition(col("bucket"))
      .write.mode("errorifexists").partitionBy("bucket").parquet(staging.toString)
    fs.delete(live, true)
    require(fs.rename(staging, live), s"compact rename $staging -> $live failed")
    val nBuckets = spark.read.parquet(s"$dir/stats").select("n_buckets").head().getInt(0)
    val next = spark.read.parquet(live.toString)
      .select("doc_id", "len").distinct()
      .agg(sum("len").as("t_total"), count(lit(1)).as("n_docs"))
      .withColumn("n_buckets", lit(nBuckets))
      .select(coalesce(col("t_total"), lit(0L)).as("t_total"),
        col("n_docs"), col("n_buckets"))
    next.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats_next")
    val target = java.nio.file.Paths.get(dir, "stats")
    val old = java.nio.file.Paths.get(dir, "stats_old")
    java.nio.file.Files.move(target, old)
    java.nio.file.Files.move(java.nio.file.Paths.get(dir, "stats_next"), target)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(old).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
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
    val stats = spark.read.parquet(s"$dir/stats")
    val nBuckets = stats.select("n_buckets").head().getInt(0)
    val bucketRow = spark.range(1).select(
      terms.zipWithIndex.map { case (t, i) =>
        pmod(xxhash64(lit(t)), lit(nBuckets)).cast("int").as(s"b$i") }: _*)
      .head()
    val buckets = terms.indices.map(bucketRow.getInt).distinct
    // pending deletes: postings anti-join the tombstone ids, and the
    // corpus scalars subtract the tombstones' recorded (len, count) —
    // the score is then EXACTLY the from-scratch BM25 over survivors
    val tombP = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val hasTomb = tombP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(tombP)
    val statsEff =
      if (!hasTomb) stats.select("t_total", "n_docs")
      else stats.select("t_total", "n_docs")
        .crossJoin(spark.read.parquet(tombP.toString)
          .agg(coalesce(sum("len"), lit(0L)).as("__dt"), count(lit(1)).as("__dn")))
        .select((col("t_total") - col("__dt")).as("t_total"),
          (col("n_docs") - col("__dn")).as("n_docs"))
    val matched = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*) && col("w").isin(terms: _*))
    val livePostings =
      if (!hasTomb) matched
      else matched.join(
        broadcast(spark.read.parquet(tombP.toString).select("doc_id").distinct()),
        Seq("doc_id"), "left_anti")
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
