package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs (SURVEY.md §2.D as one flow):
  *
  *   1. exact dedup (content hash, keep smallest id),
  *   2. near-dup clustering (n-gram Jaccard pairs → connected
  *      components) keeping each cluster's min-id survivor,
  *   3. quality gate (token count + signals).
  *
  * Every stage is a hash-partitioned aggregate/join — the composition
  * inherits each stage's 100 TB story. Swap `Dedup.jaccardPairs` for
  * `Dedup.minhashLsh` at corpus sizes where the exact inverted index
  * is too hot; the downstream contract is identical (d1/d2 pairs).
  */
object Curate {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, jaccardThreshold: Double = 0.6,
      minTokens: Int = 10): DataFrame = {
    // three consumers (the pair machinery, the cluster node set, the
    // survivor/quality pass) — materialize the exact-dedup survivor
    // corpus once instead of re-running its corpus-wide hash
    // aggregate + semi-join per consumer (r16, guide §1.2; projected
    // to the two columns every consumer needs first)
    val exact = Dedup.dropExactDuplicates(docs, idCol, textCol)
      .select(col(idCol), col(textCol))
      .localCheckpoint()
    val pairs = Dedup.jaccardPairs(exact, idCol, textCol, shingleN, jaccardThreshold)
    val clusters = Components.clusterDocuments(exact, idCol, pairs)
    val survivors = exact.join(
      clusters.filter(col(idCol) === col("cluster_id")).select(idCol),
      Seq(idCol), "left_semi")
    val sig = TextFunctions.qualitySignals(col(textCol))
    survivors
      .select(col(idCol) +: sig.map { case (n, c) => c.as(n) }: _*)
      .filter(col("n_tokens") >= minTokens)
      .select(idCol, "n_tokens", "quality_score")
  }

  /** D107 — QUALITY-elected cluster survivors: min-id survivor
    * election (the `curate` default) is deterministic but blind — it
    * can keep a cluster's worst member and drop its best. Production
    * dedup keeps the best member per near-dup cluster; here "best" is
    * the repo's quality score with the id as the deterministic tie,
    * expressed as ONE `max(struct(score, -id))` aggregate per cluster
    * — no window sort over the corpus. Returns one row per cluster:
    * the elected survivor, its score, and the cluster size (the
    * member count a dedup report wants next to every election).
    */
  def electSurvivorsByQuality(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame): DataFrame = {
    val clusters = Components.clusterDocuments(docs, idCol, pairs)
    val sig = TextFunctions.qualitySignals(col(textCol)).toMap
    val scored = docs
      .select(col(idCol), sig("quality_score").as("quality_score"))
      .join(clusters, Seq(idCol))
    scored.groupBy("cluster_id")
      .agg(
        max(struct(col("quality_score"), (-col(idCol)).as("nid"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), (-col("m.nid")).as(idCol),
        col("m.quality_score").as("quality_score"), col("n_members"))
  }

  /** The FULL curation DAG a training run executes, as one
    * composition: exact dedup → benchmark decontamination → quality
    * gate → domain-mixture resampling → sequence packing of the
    * resulting copies. Returns the per-copy packing assignment
    * (doc_id, copy_idx, shard, offsets, bin) — the corpus in training
    * order. Every stage keeps the individual operator's scale shape
    * (hash-aggregates, broadcast anti-joins, projections, per-shard
    * windows); nothing here adds a new exchange beyond the stages'
    * own.
    */
  def fullPipeline(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, domainCol: String, epochs: Map[String, Double],
      defaultEpochs: Double = 1.0, minTokens: Int = 10, shingleN: Int = 3,
      ctxLen: Int = 512, shards: Int = 8): DataFrame = {
    val deduped = Dedup.dropExactDuplicates(train, idCol, textCol)
    val clean = Decontaminate.dropContaminated(
      deduped, bench, idCol, textCol, shingleN)
    val quality = clean
      .withColumn("n_tokens", size(TextFunctions.tokens(col(textCol))))
      .filter(col("n_tokens") >= minTokens)
    val mixed = Sampling.domainMix(quality, domainCol, Seq(idCol),
      epochs, defaultEpochs)
    val copies = Sampling.explodeCopies(mixed)
      .select(col(idCol).as("doc_id"), col(domainCol), col("n_tokens"),
        col("copy_idx"))
    Packing.packRows(copies, nTokensCol = "n_tokens", shardOn = "doc_id",
      orderCols = Seq("doc_id", "copy_idx"), ctxLen = ctxLen, shards = shards)
  }
}
