package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2.D6–D7).
  */
object Similarity {

  /** D6 — brute-force cosine top-k: exact baseline. The query set is
    * broadcast (it must be small); the corpus side streams through one
    * projection + a per-query top-k window. At cluster scale the
    * window is a partial top-k per partition followed by a merge —
    * Spark's WindowExec + AQE handle that given the partitionBy.
    */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "rk")
  }

  /** D7 — sign-bit-bucketed ANN (IVF-style coarse quantization): the
    * scale path. Corpus is hashed into 2^bits buckets; each query only
    * scans its own bucket. Bucket assignment is computable at write
    * time, so at 100 TB the corpus can be stored bucketed and the
    * probe becomes a co-located join with zero corpus shuffle.
    */
  def knnLshBucketed(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
      .withColumn("bucket", signBucket(col("cv"), bits))
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
      .withColumn("bucket", signBucket(col("qv"), bits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "rk")
  }

  /** D7+ — IVF ANN with LEARNED centroids: KMeans coarse-quantizes the
    * corpus into `nLists` cells; each query probes its `nProbe`
    * nearest cells and exact-scores only those members. The cell
    * assignment is computable at write time, so at 100 TB the corpus
    * is stored partitioned by cell and a probe reads `nProbe/nLists`
    * of the data with zero corpus shuffle. KMeans itself is a
    * sampled, iterative, distributed fit — train on a sample at real
    * scale.
    */
  def knnIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int, nProbe: Int,
      seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    // cluster on UNIT vectors: euclidean cells over normalized points
    // are cosine cells, so probing matches the similarity metric
    val c = corpus.select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
      .withColumn("features", array_to_vector(transform(col("cv"), x => x / col("cn"))))
    val model = new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("features")
      .fit(c.select("features"))
    val assigned = model.transform(c).withColumnRenamed("prediction", "cell")
      .select("cid", "cv", "cn", "cell")

    // query → its nProbe nearest centroids (centroids are tiny: driver math)
    val centroids = model.clusterCenters.zipWithIndex
    val bcCentroids = spark.sparkContext.broadcast(centroids)
    val probeCells = udf { (qv: Seq[Double], qn: Double) =>
      bcCentroids.value.map { case (ctr: Vector, idx: Int) =>
        var d = 0.0
        var i = 0
        while (i < qv.length) { val t = qv(i) / qn - ctr(i); d += t * t; i += 1 }
        (idx, d)
      }.sortBy(_._2).take(nProbe).map(_._1)
    }
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
      .withColumn("cell", explode(probeCells(col("qv"), col("qn"))))

    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "rk", "sim")
  }
}
