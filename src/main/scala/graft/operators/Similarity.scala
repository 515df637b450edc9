package graft.operators

import graft.functions.VectorFunctions._
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
}
