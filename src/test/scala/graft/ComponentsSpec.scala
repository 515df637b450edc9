package graft

import graft.operators.Components
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The hybrid components (min-label prelude escaping to Kiveris et
  * al. 2014 large-star/small-star) against the independently-shaped
  * min-label reference and hand-built graphs — including the
  * long-chain case that proves the escape's O(log n) round
  * compression, which min-label cannot have.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(
        nodes.toDF("id"), edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def runAlt(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponentsAlternating(
        nodes.toDF("id"), edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def runRef(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponentsMinLabel(
        nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hand graphs: cliques, isolated nodes, reversed edges, self-loops") {
    // two triangles bridged, one pair, two isolated; edges in mixed
    // orientation plus a self-loop that must be ignored
    val nodes = (0L to 9L)
    val edges = Seq((1L, 0L), (1L, 2L), (0L, 2L), (2L, 3L), (4L, 3L),
      (5L, 4L), (7L, 6L), (8L, 8L))
    val got = run(nodes, edges)
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 6L, 7L -> 6L, 8L -> 8L, 9L -> 9L))
  }

  test("equals min-label on random graphs across densities") {
    val rng = new scala.util.Random(1234)
    for (trial <- 0 until 6) {
      val n = 40 + rng.nextInt(60)
      val degree = 1 + trial % 3
      val nodes = (0L until n.toLong)
      val edges = (0 until n * degree).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      val got = run(nodes, edges)
      val ref = runRef(nodes, edges)
      assert(got === ref, s"trial=$trial n=$n degree=$degree")
      // the escape-path algorithm must agree on its own, not only
      // when the hybrid happens to reach it
      assert(runAlt(nodes, edges) === ref, s"alt trial=$trial n=$n degree=$degree")
    }
  }

  test("long chain converges in O(log n) rounds, not O(diameter)") {
    // a 100-node path has diameter 99: min-label needs ~100 rounds;
    // the hybrid's 4-round prelude cannot finish it, so it must
    // escape to the alternating algorithm and finish well inside 10
    // rewriting rounds
    val nodes = (0L until 100L)
    val edges = (0L until 99L).map(i => (i, i + 1))
    val got = run(nodes, edges, maxIter = 10)
    assert(got === nodes.map(_ -> 0L).toMap,
      "chain not collapsed — round-compression escape lost")
    assert(runAlt(nodes, edges, maxIter = 10) === nodes.map(_ -> 0L).toMap)
  }

  test("clusterDocuments: pair columns, singleton docs, min survivor") {
    import spark.implicits._
    val docs = Seq(10L, 11L, 12L, 13L).toDF("doc_id")
    val pairs = Seq((12L, 11L)).toDF("d1", "d2")
    val got = Components.clusterDocuments(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 10L, 11L -> 11L, 12L -> 11L, 13L -> 13L))
  }

  test("empty edge set: every node its own component") {
    val got = run(Seq(3L, 4L), Seq.empty)
    assert(got === Map(3L -> 3L, 4L -> 4L))
  }
}
