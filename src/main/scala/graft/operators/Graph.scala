package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality (SURVEY.md §2.D — source-quality weighting).
  * Web-scale curation pipelines rank hosts/documents by link
  * centrality and feed the rank into quality weighting; this is the
  * PageRank shape of that step, integer-exact so an independent
  * engine replays it bit-for-bit.
  *
  * Arithmetic contract (mirrors the k-means/D28 trick): ranks live in
  * scaled integer space (`scale` = 1e12 ≈ parts-per-trillion), every
  * division is integral floor division, so there is no float
  * accumulation order to disagree on. Per iteration:
  *
  *   r'(v) = ((scale/n)·(100−d))//100  +  (d · Σ_{(u,v)∈E} r(u)//outdeg(u))//100
  *
  * with d the damping numerator (85 = 0.85).
  *
  * Scale shape: ranks and degrees are fixed-width (node, long) rows;
  * each iteration is ONE shuffle — the contribution aggregate keyed
  * by dst (map-side partial sums first); the rank⋈degree join is
  * node-table-sized, and `localCheckpoint` per round keeps lineage
  * flat (the Components.scala discipline). Nothing corpus-sized ever
  * re-shuffles: at 100 TB the edge list partitions by src once and
  * is reused every round.
  */
object Graph {

  /** @param edges columns `src`, `dst` (directed, pre-deduped or not —
    *              deduped here); every node must appear in at least
    *              one edge (node set = src ∪ dst).
    * @return (node, rank_ppt) — rank in parts-per-trillion of total
    */
  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, d100: Long = 85L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(deg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val init = scale / n
    val base = init * (100L - d100) / 100L
    var r = nodes.select(col("v"), lit(init).as("r"))
    for (_ <- 1 to iters) {
      r = iterate(nodes, withDeg, r, base, d100).localCheckpoint()
    }
    r.select(col("v").as("node"), col("r").as("rank_ppt"))
  }

  /** One rank iteration (uncheckpointed — PlanSpec asserts its shape:
    * partial-agg contribution sum, no cartesian, no UDF).
    */
  private[graft] def iterate(nodes: DataFrame, withDeg: DataFrame,
      r: DataFrame, base: Long, d100: Long): DataFrame = {
    val contrib = withDeg.join(r, withDeg("src") === r("v"))
      .select(col("dst").as("v"), expr("r div outdeg").as("c"))
      .groupBy("v").agg(sum("c").as("s"))
    nodes.join(contrib, Seq("v"), "left")
      .select(col("v"),
        (lit(base) + expr(s"($d100 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
  }
}
