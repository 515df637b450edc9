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
