package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components — turns near-dup candidate PAIRS into dedup
  * CLUSTERS (the survivor-election step of a training-data pipeline;
  * SURVEY.md §2.D).
  *
  * Default algorithm: HYBRID, decided by the data rather than guessed.
  * Min-label propagation runs first for a bounded handful of rounds —
  * its rounds are the cheaper exchange (one join + one aggregate),
  * and the operator's common input (near-dup graphs = clique unions)
  * converges in 2-3 of them; measured at sf0.1 this is ~30% faster
  * than opening with edge rewriting. If the graph is NOT done by then
  * — a long chain, where diameter-bound iteration is the weakest loop
  * in a graph suite — it escapes to alternating large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014), whose round-compressed edge rewriting converges in
  * O(log n) rounds on ANY shape. The prelude costs a constant ≤4
  * cheap exchanges; the escape keeps the 100 TB worst case safe.
  */
object Components {

  /** @param nodes one column `id` (every node, with or without edges)
    * @param edges  columns `src`, `dst` (undirected; either order)
    * @param minLabelRounds cheap-phase budget before escaping to the
    *                       round-compressed algorithm
    * @return (id, component) where component = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25, minLabelRounds: Int = 4): DataFrame = {
    val sym = symmetrized(edges)
    val (labels, converged) = minLabelLoop(nodes, sym, minLabelRounds)
    if (converged) labels
    else connectedComponentsAlternating(nodes, edges, maxIter)
  }

  /** Alternating large-star/small-star (Kiveris et al. SoCC 2014):
    * O(log n) rounds on any graph shape. Every round is two
    * aggregate+join exchanges over the (shrinking) edge set; edges
    * are localCheckpoint'ed per round so lineage stays flat.
    */
  def connectedComponentsAlternating(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    // canonical (u < v) undirected edge set; self-loops drop
    var e = edges
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var converged = e.isEmpty
    var it = 0
    while (!converged && it < maxIter) {
      // large-star: every strictly-larger neighbor of a links to the
      // minimum of a's closed neighborhood — long chains halve
      val adj = e.select(col("u").as("a"), col("v").as("b"))
        .union(e.select(col("v").as("a"), col("u").as("b")))
      val lsMin = adj.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val ls = adj.join(lsMin, "a")
        .filter(col("b") > col("a"))
        .select(col("m").as("u"), col("b").as("v"))
        .distinct()
      // small-star: every edge keyed by its larger endpoint v; all of
      // v's smaller neighbors (and v itself) re-link to their minimum.
      // Each input row emits exactly one edge: the row carrying the
      // minimum re-links v, every other row re-links its u.
      val ssMin = ls.groupBy("v").agg(min("u").as("m"))
      val ss = ls.join(ssMin, "v")
        .select(col("m").as("u"),
          when(col("u") === col("m"), col("v")).otherwise(col("u")).as("v"))
        .distinct()
        .localCheckpoint()
      // fixpoint iff the edge set is a star forest: no node appears
      // both as a member (v) and a root (u). Steps preserve
      // connectivity and the component min is never a member, so a
      // chain-free component is a single star rooted at its min.
      val chained = ss.select("u").distinct()
        .join(ss.select(col("v").as("u")), Seq("u"), "left_semi")
        .limit(1).count()
      e = ss
      converged = chained == 0
      it += 1
    }
    nodes.select(col("id"))
      .join(e.select(col("v").as("id"), col("u").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Reference implementation: iterative min-label propagation —
    * every node adopts the smallest label in its closed neighborhood
    * each round, O(component diameter) rounds to fixpoint. Kept as
    * the independently-shaped oracle for the alternating algorithm
    * (spec-compared on random graphs) and as the simpler program for
    * reading the contract.
    */
  def connectedComponentsMinLabel(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame =
    minLabelLoop(nodes, symmetrized(edges), maxIter)._1

  private def symmetrized(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

  /** Min-label rounds over a pre-symmetrized edge set; returns the
    * labels after ≤ maxIter rounds plus whether a fixpoint was hit
    * (the hybrid's escape signal).
    */
  private def minLabelLoop(nodes: DataFrame, sym: DataFrame,
      maxIter: Int): (DataFrame, Boolean) = {
    var labels = nodes.select(col("id"), col("id").as("component")).localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // each node's best neighbor label this round
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("component").as("nbr_component"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("component", "prev"), "id")
        .filter(col("component") =!= col("prev")).limit(1).count()
      labels = next
      converged = changed == 0
      it += 1
    }
    (labels, converged)
  }

  /** Cluster documents by near-dup pairs: every doc gets the min
    * doc_id of its component; docs without pairs cluster alone.
    */
  def clusterDocuments(docs: DataFrame, idCol: String, pairs: DataFrame,
      d1: String = "d1", d2: String = "d2"): DataFrame =
    connectedComponents(
      docs.select(col(idCol).as("id")),
      pairs.select(col(d1).as("src"), col(d2).as("dst")))
      .select(col("id").as(idCol), col("component").as("cluster_id"))
}
