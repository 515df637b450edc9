package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level word statistics — the two-pass shape (corpus
  * aggregate, then join back per document) that distinguishes these
  * from the purely per-row TextFunctions scores. The rarity signal
  * (documents dominated by words few other documents use) is a
  * standard web-corpus quality filter.
  *
  * Scale shape: the exploded (doc, word) stream reduces to DISTINCT
  * words per doc before any exchange; document frequencies come from
  * one hash-aggregate over words; the join back is word-keyed with
  * map-side partial aggregation on the doc side. All outputs are
  * INTEGERS (sum/min of frequencies, distinct counts) so the gate is
  * exact on every engine — ratios are a trivial client-side division.
  */
object CorpusStats {

  /** (word, df) — in how many documents each word appears. */
  def wordDocFrequency(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df"))

  /** Per-document rarity profile: distinct word count, summed and
    * minimum document frequency of its words. Low min_df = contains
    * a near-unique word; low sum_df/n_distinct_words = generally
    * rare vocabulary.
    */
  def rarityScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
    val df = wordDocFrequency(docs, idCol, textCol)
    words.join(df, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_words"),
        sum("df").as("sum_df"),
        min("df").as("min_df"))
  }
}
