package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training
  * documents that share word n-grams with an evaluation/benchmark set
  * (the standard test-set-overlap check run before LLM training; the
  * n-gram-match formulation follows the published GPT-3/PaLM data
  * cards).
  *
  * Scale shape: benchmark sets are tiny relative to the corpus (a few
  * thousand eval documents vs billions of training docs), so the
  * benchmark's distinct shingle set is BROADCAST — the training side
  * is a single shingle projection + broadcast-hash semi-join with
  * ZERO shuffle of corpus data. The per-doc overlap count is one
  * map-side-partial aggregate on doc_id. Nothing in the plan grows
  * with corpus size except the linear scan.
  */
object Decontaminate {

  /** Per-training-doc count of distinct `n`-gram overlaps with the
    * benchmark corpus. Only contaminated docs are returned (docs with
    * zero overlap are the overwhelming majority at scale — emitting
    * them would turn a small report into a full-corpus copy).
    *
    * @return (doc_id, n_overlap) — one row per contaminated doc.
    */
  def overlap(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val trainSh = Dedup.explodeShingles(Dedup.shingleTable(train, idCol, textCol, n))
    val benchSh = Dedup.explodeShingles(Dedup.shingleTable(bench, idCol, textCol, n))
      .select("shingle").distinct()
    // shingle sets are distinct per doc, so count(*) after the join is
    // the number of DISTINCT overlapping n-grams
    trainSh.join(broadcast(benchSh), "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** D106 — split-contamination audit: given a (doc_id, split)
    * assignment, the n-gram overlap every val/test doc shares with the
    * TRAIN split — "did leakage actually happen under THIS split".
    * D105's clustered split guarantees near-dups don't straddle; this
    * measures what still leaks (shared boilerplate, similarity below
    * the clustering threshold), and run against a plain per-doc hash
    * split it quantifies exactly the contamination D105 exists to
    * prevent. Scale shape: the join is keyed on the shingle — the
    * train side reduces to its DISTINCT shingle set before the
    * exchange, the eval side is the split fraction of the corpus, and
    * the output is one row per eval doc (eval splits are small by
    * construction; zero-overlap docs are kept — the audit's answer is
    * a distribution, not a blacklist).
    *
    * @return (idCol, split, n_shingles, n_overlap, leak_ppm) for every
    *         val/test doc with at least n tokens
    */
  def splitContamination(docs: DataFrame, splits: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val sh = Dedup.explodeShingles(Dedup.shingleTable(docs, idCol, textCol, n))
    val tagged = sh.join(splits.select(col(idCol), col("split")), Seq(idCol))
    val trainSh = tagged.filter(col("split") === "train")
      .select("shingle").distinct()
    val evalSh = tagged.filter(col("split") =!= "train")
    val totals = evalSh.groupBy(idCol, "split")
      .agg(count(lit(1)).as("n_shingles"))
    val hits = evalSh.join(trainSh, Seq("shingle"))
      .groupBy(idCol, "split").agg(count(lit(1)).as("n_overlap"))
    totals.join(hits, Seq(idCol, "split"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("leak_ppm", expr("n_overlap * 1000000 div n_shingles"))
  }

  /** Apply step: the training corpus with contaminated docs removed
    * (docs sharing at least `minOverlap` distinct n-grams with the
    * benchmark set). A broadcast anti-join — zero corpus shuffle.
    */
  def dropContaminated(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minOverlap: Int = 1): DataFrame = {
    val bad = overlap(train, bench, idCol, textCol, n)
      .filter(col("n_overlap") >= minOverlap)
      .select(col("doc_id").as("__bad_id"))
    train.join(broadcast(bad), train(idCol) === col("__bad_id"), "left_anti")
  }
}
