package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — turns
  * near-dup candidate PAIRS into dedup CLUSTERS (the survivor-election
  * step of a training-data pipeline; SURVEY.md §2.D).
  *
  * Each round every node adopts the smallest label among itself and
  * its neighbors; rounds until a fixpoint. Convergence needs
  * O(component diameter) rounds — near-dup graphs are unions of small
  * cliques, so 2-4 rounds in practice. Every round is one
  * shuffle-join + aggregate keyed by node id; labels are
  * localCheckpoint'ed per round so lineage stays flat at 100 TB.
  */
object Components {

  /** @param nodes one column `id` (every node, with or without edges)
    * @param edges  columns `src`, `dst` (undirected; either order)
    * @return (id, component) where component = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

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
    labels
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
