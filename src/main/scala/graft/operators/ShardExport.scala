package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export (SURVEY.md §2.D): the last step of a
  * curation pipeline — lay the corpus out as N deterministic shards a
  * data loader streams, plus a MANIFEST that pins what each shard
  * must contain (doc count, token count, and an order-sensitive
  * content fingerprint). The manifest is what makes a 100 TB export
  * auditable: a re-run on different hardware must reproduce the same
  * per-shard signatures or the export is wrong.
  *
  * Determinism contract: shard = md5-uniform("seed:doc_id") % N and
  * within-shard order = (shuffle key, doc_id) — both pure functions
  * of (data, seed), so an independent engine replays assignment,
  * order, and fingerprint exactly.
  *
  * Scale shape: ONE shuffle (repartition by shard) feeds both the
  * partitioned write and, on read-back, the manifest aggregate;
  * per-shard fingerprints hash fixed-width md5 strings, never text;
  * at 1000 executors you run thousands of shards and every shard
  * writes and fingerprints independently.
  */
object ShardExport {

  /** D76 — rendezvous (highest-random-weight) consistent shard
    * assignment (Thaler & Ravishankar 1996): each doc goes to the
    * shard with the HIGHEST md5("seed:shard:id"). The property mod-N
    * (shardAssign) lacks: growing N→N+1 moves only the ~1/(N+1) of
    * keys whose NEW shard's hash beats their previous winner — mod-N
    * reshuffles (N−1)/N of the entire corpus, which at 100 TB is the
    * difference between topping up one shard and rewriting the
    * export. Argmax is `array_max` over (hash, shard) structs — a
    * zero-shuffle projection, no window, N md5s per row.
    */
  def rendezvousAssign(docs: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"invalid nShards $nShards")
    val hashes = array((0 until nShards).map { sh =>
      struct(
        md5(concat_ws(":", lit(seed), lit(sh), col(idCol).cast("string"))
          .cast("binary")).as("h"),
        lit(sh).as("s"))
    }: _*)
    docs.select(col(idCol).as("doc_id"))
      .withColumn("shard", array_max(hashes).getField("s"))
  }

  /** Shard assignment + per-doc audit columns (no IO). */
  def shardAssign(docs: DataFrame, idCol: String, textCol: String,
      seed: Long, nShards: Int): DataFrame = {
    require(nShards > 0, s"invalid nShards $nShards")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("skey", Prep.shuffleKey(col("doc_id"), seed))
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 12), 16, 10).cast("long") % nShards).cast("int"))
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withColumn("n_tokens",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
  }

  /** Write the corpus as shard-partitioned parquet, then read the
    * COMMITTED table back and build the manifest from it — so the
    * manifest proves the on-disk bytes, not the pre-write plan.
    * Returns (shard, n_docs, n_tokens, shard_sig).
    */
  def exportShards(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, seed: Long, nShards: Int, outDir: String): DataFrame = {
    val assigned = shardAssign(docs, idCol, textCol, seed, nShards)
    assigned.repartition(nShards, col("shard"))
      .sortWithinPartitions("skey", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    manifest(spark.read.parquet(outDir))
  }

  /** Manifest over an exported shard table: the fingerprint hashes
    * the within-shard-ordered concatenation of per-doc content
    * hashes, so doc membership, content, AND order are all pinned.
    */
  def manifest(shards: DataFrame): DataFrame =
    shards.groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        md5(concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("skey"), col("doc_id"), col("content_hash")))),
            x => x.getField("content_hash"))).cast("binary")).as("shard_sig"))
}
