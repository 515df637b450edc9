package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seed-vs-corpus document classification — the CCNet / fastText
  * quality-filter shape (train a cheap linear model on a weakly
  * labeled seed set, score every document, filter by threshold),
  * reduced to its engine-exact core so a SQL oracle replays it
  * bit-for-bit.
  */
object Classify {

  /** D40 — balanced-prior token-posterior scoring: per token the
    * model is the fixed-point add-one posterior
    * `s(w) = floor(scale·(cpos(w)+1) / (cpos(w)+cneg(w)+2))` — the
    * probability the token came from the seed class under a balanced
    * prior — and a document's score is the sum of s(w) over its token
    * OCCURRENCES (a linear classifier on token counts, the fastText
    * mean-of-features shape). `pred` marks documents whose MEAN
    * posterior exceeds 1/2, via the integer compare
    * `2·score > scale·n_tok` (no float division anywhere).
    *
    * Engine-exactness is why the arithmetic is this and not log-NB:
    * every step is integer multiply/divide, so Spark and any SQL
    * engine agree to the last unit. The per-token product
    * `(cpos+1)·scale` stays inside Long up to per-token class counts
    * of ~9·10^12 at the default scale — 100 TB-corpus safe, which the
    * textbook `(cpos+1)·(Tneg+V)` likelihood-ratio numerator is not
    * (it crosses 2^63 once class token totals pass ~10^13).
    *
    * Scale shape at 100 TB: the token stream reduces to the
    * vocab-sized (w, cpos, cneg) table in ONE corpus aggregate (the
    * seed label rides along as a conditional sum — no second pass, no
    * seed/rest split-and-union); the score join is hash-partitioned
    * on the token with map-side partial aggregation of the per-doc
    * sum. No driver state, no UDF, no cartesian.
    */
  def seedPosteriorScore(docs: DataFrame, idCol: String, textCol: String,
      seedLabel: Column, scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"invalid scale $scale")
    val toksArr = split(coalesce(col(textCol), lit("")), " ")
    val base = docs.select(col(idCol).as("doc_id"),
      seedLabel.cast("boolean").as("__pos"), toksArr.as("__t"))
    val occ = base
      .select(col("doc_id"), col("__pos"), explode(col("__t")).as("w"))
      .filter(col("w") =!= "")
    val model = occ.groupBy("w")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("cpos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("cneg"))
      .select(col("w"),
        expr(s"(cpos + 1) * $scale div (cpos + cneg + 2)").as("s"))
    val scored = occ.join(model, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("s")).as("score"))
    base.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("score"), lit(0L)).as("score"))
      .withColumn("pred", lit(2L) * col("score") > lit(scale) * col("n_tok"))
  }
}
