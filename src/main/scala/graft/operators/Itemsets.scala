package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over token baskets (Agrawal & Srikant,
  * VLDB'94 — Apriori; the SON two-pass shape of Savasere et al.
  * VLDB'95 is the same plan distributed): which words CO-OCCUR in a
  * large fraction of documents. In a curation pipeline this surfaces
  * boilerplate templates (navigation bars, license blocks, prompt
  * scaffolding) whose members are individually common but whose JOINT
  * occurrence marks a template — the signal n-gram shingles miss when
  * the template words are not adjacent.
  *
  * Support thresholds are exact rationals against the corpus doc count
  * (`support·den ≥ N·num` — no float percentage to disagree over), so
  * the result replays bit-for-bit in an independent engine at any SF.
  *
  * Scale shape: baskets are per-doc DISTINCT token sets built in one
  * projection (array_distinct before the explode — within-doc dedup
  * costs no exchange); pass 1 is ONE vocab-keyed map-side-partial
  * count; the apriori prune joins baskets to the (small, broadcast)
  * frequent-item table, so pass 2's per-doc pair fan-out is bounded by
  * the doc's FREQUENT-item count squared, not its vocabulary — the df-
  * cap discipline applied to pair mining. The self-join is doc-keyed
  * (both sides the identical plan → one exchange, reused), and the
  * pair count is again map-side partial. The corpus-size scalar N
  * rides as a broadcast single-row cross join.
  */
object Itemsets {

  /** Frequent token pairs: items with doc-support ≥ itemNum/itemDen of
    * the corpus, then pairs of frequent items with joint doc-support ≥
    * pairNum/pairDen.
    *
    * @return (item1, item2, support) with item1 < item2
    */
  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
      itemNum: Int, itemDen: Int, pairNum: Int, pairDen: Int): DataFrame = {
    require(itemNum > 0 && itemNum <= itemDen, s"bad item support $itemNum/$itemDen")
    require(pairNum > 0 && pairNum <= pairDen, s"bad pair support $pairNum/$pairDen")
    val items = docs
      .select(col(idCol).as("doc_id"),
        array_distinct(TextFunctions.tokens(col(textCol))).as("basket"))
      .select(col("doc_id"), explode(col("basket")).as("item"))
      .filter(col("item") =!= "")
    val n = docs.select(count(lit(1)).as("n_docs"))
    val f1 = items.groupBy("item").agg(count(lit(1)).as("item_support"))
      .crossJoin(broadcast(n))
      .filter(col("item_support") * itemDen >= col("n_docs") * itemNum)
      .select("item")
    // apriori prune: only frequent items enter pair generation
    val fi = items.join(broadcast(f1), "item")
    fi.as("a").join(fi.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item1"), col("b.item").as("item2"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(n))
      .filter(col("support") * pairDen >= col("n_docs") * pairNum)
      .select("item1", "item2", "support")
  }
}
