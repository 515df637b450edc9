package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus clustering over embedding columns — the semantic-grouping
  * primitive a training-data pipeline uses for mixture balancing
  * (cluster, then stratify by cluster), semantic dedup at the cluster
  * level, and topic-coverage audits.
  *
  * Lloyd's k-means in the classic scalable shape: centroids live on
  * the driver (k·dim values — broadcast-sized by contract, like the
  * IVF quantizer in Similarity), assignment is a pure projection
  * against centroid literals, and the re-estimation step is ONE
  * partial-aggregated groupBy per iteration. At 100 TB each iteration
  * moves only k·dim running sums per partition — never a vector.
  *
  * Arithmetic is EXACT by construction: components are quantized to
  * integers (`floor(x · scale)` — float→double widening, a power-of-2
  * multiply, and floor are all exact), distances are integer sums of
  * squares, and centroid updates use truncating integer division —
  * identical on every engine, so cluster assignments are a pure
  * function of (data, k, iters, scale) that an SQL oracle can replay
  * verbatim. Quantization costs nothing real at clustering
  * granularity: scale 256 keeps ~2 decimal digits per component,
  * while making the whole iteration order-independent (float
  * summation order across partitions would otherwise make centroids —
  * and borderline assignments — nondeterministic).
  */
object Clustering {

  /** K-means over quantized embeddings. Returns (vec_id, cluster)
    * with cluster in [0, k). Init: the vectors of the k smallest ids
    * (deterministic). Ties in assignment break to the lowest cluster
    * index; a cluster left empty keeps its previous centroid.
    */
  def kmeansQuantized(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int, quantScale: Int = 256): DataFrame = {
    require(k > 0 && iters >= 0 && dim > 0)
    val q = quantize(emb, idCol, vecCol, quantScale)
    q.persist() // reused iters+1 times during the driver loop

    var centroids: Array[Array[Long]] = q.orderBy("vec_id").limit(k).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("q").toArray)
    require(centroids.length == k, s"need at least $k vectors, got ${centroids.length}")

    for (_ <- 0 until iters) {
      val sums = assign(q, centroids)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          array((0 until dim).map(i => sum(col("q").getItem(i))): _*).as("s"))
        .collect()
      val byCluster = sums.map { r =>
        r.getAs[Int]("cluster") ->
          ((r.getAs[Long]("n"), r.getAs[scala.collection.Seq[Long]]("s")))
      }.toMap
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        byCluster.get(j) match {
          // truncating Long division — the exact semantics of the
          // oracle's BIGINT // BIGINT
          case Some((n, s)) => s.map(_ / n).toArray
          case None => old
        }
      }
    }
    val out = assign(q, centroids).select("vec_id", "cluster")
    q.unpersist(blocking = false) // final assignment re-derives q once
    out
  }

  /** Integer centroids after the driver loop (inspection surface). */
  def centroidsOf(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int, quantScale: Int = 256): Array[Array[Long]] = {
    // same loop, exposed for specs; tiny duplication beats a leaked cache
    val q = quantize(emb, idCol, vecCol, quantScale)
    var centroids: Array[Array[Long]] = q.orderBy("vec_id").limit(k).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("q").toArray)
    for (_ <- 0 until iters) {
      val sums = assign(q, centroids).groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          array((0 until dim).map(i => sum(col("q").getItem(i))): _*).as("s"))
        .collect()
      val byCluster = sums.map(r => r.getAs[Int]("cluster") ->
        ((r.getAs[Long]("n"), r.getAs[scala.collection.Seq[Long]]("s")))).toMap
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        byCluster.get(j).map { case (n, s) => s.map(_ / n).toArray }.getOrElse(old)
      }
    }
    centroids
  }

  /** D90 — k-center coreset selection by greedy farthest-point
    * traversal (Gonzalez, TCS 1985 — the 2-approximate metric k-center
    * maximizer): pick the corpus vector farthest from everything
    * chosen so far, k times. Where D82's greedy coverage maximizes
    * n-GRAM diversity, this maximizes EMBEDDING-space coverage — the
    * coreset shape for "select a budget of maximally spread examples"
    * (diversity sampling for labeling/eval sets); the selected radius
    * is within 2× of the best possible k-cover by the classic bound.
    *
    * Integer-exact: vectors on the floor(x·256) grid, every distance a
    * BIGINT sum of squares, argmax ties → lowest vec_id. Seed = the
    * smallest vec_id (deterministic).
    *
    * Scale shape: state is ONE narrow (vec_id, q, mind) relation;
    * each round updates the running min with a codegen'd
    * `SqDistToCenter` against the newly chosen plan-shipped center —
    * a PROJECTION, no shuffle, composed lazily (k nested `least`
    * layers collapse into one projection; nothing is checkpointed
    * because no exchange ever enters the lineage) — and picks the
    * next center with one map-side-partial single-row argmax
    * (`max(struct(mind, −id, q))`). Per round exactly one job whose
    * only exchange is the final 1-row-per-partition reduce; the
    * centers live on the driver (k·dim longs).
    *
    * @return (round, vec_id, dist) — round 1..k in pick order; dist =
    *         the squared distance that made the pick (the covering
    *         radius achieved by the previous rounds), 0 for the seed
    */
  def kCenter(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      quantScale: Int = 256): DataFrame = {
    require(k >= 1, s"invalid k $k")
    val spark = emb.sparkSession
    val q = quantize(emb, idCol, vecCol, quantScale)
    val seedRow = q.orderBy("vec_id").limit(1).collect()
    require(seedRow.nonEmpty, "k-center needs a non-empty corpus")
    val seedId = seedRow(0).getLong(0)
    val seedQ = seedRow(0).getAs[scala.collection.Seq[Long]]("q").toArray
    val picks = scala.collection.mutable.ArrayBuffer((1, seedId, 0L))
    var st = q.withColumn("mind",
      graft.functions.SqDistToCenter.sqDistToCenter(col("q"), seedQ))
    for (r <- 2 to k) {
      val far = st.agg(max(struct(col("mind"), (-col("vec_id")).as("nid"),
        col("q"))).as("m")).collect()(0).getStruct(0)
      val (dist, id, cq) =
        (far.getLong(0), -far.getLong(1), far.getSeq[Long](2).toArray)
      picks += ((r, id, dist))
      st = st.withColumn("mind", least(col("mind"),
        graft.functions.SqDistToCenter.sqDistToCenter(col("q"), cq)))
    }
    import spark.implicits._
    picks.toSeq.toDF("round", "vec_id", "dist")
  }

  /** E66 substrate — per-cluster sufficient statistics of ONE slice of
    * the corpus against FIXED centroids: (cluster, n, s[dim]) with n
    * the member count and s the per-dimension component sums. This is
    * the linear half of a Lloyd iteration (assignment frozen at the
    * given centroids), so partials computed over disjoint slices —
    * micro-batches of a stream, shards of a corpus — merge EXACTLY by
    * plain sums ([[centroidRefineRows]]): the additive identity the
    * CountSketch grid (E64) and KMV bottom-k (E63) merges rely on,
    * here for the centroid-refresh loop of the E35 streaming semantic
    * router (mini-batch k-means in the Sculley WWW'10 shape, made
    * exact by quantized integer arithmetic). One row per non-empty
    * cluster — kilobytes per epoch, never a vector retained.
    */
  def centroidStatsPartial(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Long]], dim: Int,
      quantScale: Int = 256): DataFrame =
    assign(quantize(emb, idCol, vecCol, quantScale), centroids)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        array((0 until dim).map(i => sum(col("q").getItem(i))): _*).as("s"))

  /** Fold persisted stat partials into refreshed centroids: per
    * cluster Σn and elementwise Σs across every epoch, then ONE exact
    * Lloyd update c = Σs / Σn (truncating Long division — the
    * oracle's BIGINT `//`); a cluster no partial touched keeps its
    * seed centroid with n = 0. Output is long-form (cluster, i, c, n)
    * with i 1-based — k·dim rows, the driver-bounded inspection shape
    * (k·dim longs, the same contract as the Lloyd loop's collect).
    */
  def centroidRefineRows(spark: org.apache.spark.sql.SparkSession,
      statsDirs: Seq[String], seed: Array[Array[Long]],
      dim: Int): DataFrame = {
    import spark.implicits._
    val byCluster: Map[Int, (Long, Seq[Long])] =
      if (statsDirs.isEmpty) Map.empty
      else spark.read.parquet(statsDirs: _*)
        .groupBy("cluster")
        .agg(sum(col("n")).as("n"),
          array((0 until dim).map(i => sum(col("s").getItem(i))): _*).as("s"))
        .collect() // k rows of k·dim longs — driver-bounded by contract
        .map(r => r.getAs[Int]("cluster") ->
          ((r.getAs[Long]("n"), r.getAs[scala.collection.Seq[Long]]("s").toSeq)))
        .toMap
    val rows = seed.zipWithIndex.flatMap { case (sc, j) =>
      byCluster.get(j) match {
        case Some((n, s)) => (0 until dim).map(i => (j, i + 1, s(i) / n, n))
        case None => (0 until dim).map(i => (j, i + 1, sc(i), 0L))
      }
    }
    rows.toSeq.toDF("cluster", "i", "c", "n")
  }

  /** D136 — centroid-refresh CHURN audit, the go/no-go measurement
    * between an E66 refresh and an IVF index rebuild: per (old
    * cluster, new cluster) pair, how many vectors would MOVE if the
    * refreshed centroids were rolled out. Off-diagonal mass is the
    * rebuild bill — at 100 TB every moved vector is a cell-partition
    * rewrite in the D7+ index — so the audit prices the rollout
    * before any data moves ("measure, don't guess", the D95/D97
    * discipline applied to the router's update loop). One projection
    * with two codegen'd argmins + a ≤k²-row aggregate; no shuffle of
    * vector data.
    */
  def centroidChurn(emb: DataFrame, idCol: String, vecCol: String,
      before: Array[Array[Long]], after: Array[Array[Long]],
      quantScale: Int = 256): DataFrame =
    quantize(emb, idCol, vecCol, quantScale)
      .withColumn("from_cluster",
        graft.functions.NearestCentroid.nearestCentroid(col("q"), before))
      .withColumn("to_cluster",
        graft.functions.NearestCentroid.nearestCentroid(col("q"), after))
      .groupBy("from_cluster", "to_cluster")
      .agg(count(lit(1)).as("n"))

  private def quantize(emb: DataFrame, idCol: String, vecCol: String,
      quantScale: Int): DataFrame =
    emb.select(col(idCol).as("vec_id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * quantScale).cast("long")).as("q"))

  /** Nearest-centroid assignment as a projection: ONE codegen'd argmin
    * over the plan-shipped centroid table (ties → lowest cluster
    * index). A single loop — not k composed `aggregate(zip_with(...))`
    * distance trees — so the projection stays inside whole-stage
    * codegen at k=256+, where a duplicated expression tree would blow
    * the generated-method size limit and fall back to interpreted eval.
    */
  private def assign(q: DataFrame, centroids: Array[Array[Long]]): DataFrame =
    q.withColumn("cluster",
      graft.functions.NearestCentroid.nearestCentroid(col("q"), centroids))
}
