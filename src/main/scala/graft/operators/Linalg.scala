package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Embedding-matrix aggregates for corpus analytics — the PCA /
  * whitening / calibration prep that operates on ALL vectors at once
  * rather than per row.
  */
object Linalg {

  /** D49 — integer-exact Gram (scatter) matrix over int8-QUANTIZED
    * embeddings: G[i][j] = Σ_vectors q_i·q_j, the input every
    * PCA/whitening/low-rank-probe step starts from, computed on the
    * quantized representation (D32) so the sums are exact integers an
    * oracle replays — a float Gram would drift by reduction order.
    *
    * Scale shape at 100 TB: the per-partition accumulator is ONE
    * dim×dim Long triangle held in memory (dim² ≤ ~1M for dim 1024);
    * each partition emits exactly dim(dim+1)/2 partial rows no matter
    * how many vectors it holds, and the only exchange is the (i, j)
    * partial-sum reduce — corpus vectors never shuffle. This is the
    * one shape dim² aggregate EXPRESSIONS cannot take (they would
    * blow codegen limits), so the imperative per-partition fold is
    * the honest tool. Overflow-safe: |q| ≤ 127, so ~10^12 vectors
    * stay inside Long per cell.
    */
  def gramInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q: Dataset[Seq[Long]] =
      Prep.quantizeInt8(emb, idCol, vecCol).select("q").as[Seq[Long]]
    q.mapPartitions { it =>
      var acc: Array[Long] = null
      var dim = 0
      it.foreach { v =>
        if (acc == null) { dim = v.length; acc = new Array[Long](dim * dim) }
        require(v.length == dim, s"ragged embedding: ${v.length} vs $dim")
        var i = 0
        while (i < dim) {
          val qi = v(i)
          var j = i
          while (j < dim) { acc(i * dim + j) += qi * v(j); j += 1 }
          i += 1
        }
      }
      if (acc == null) Iterator.empty
      else (for (i <- 0 until dim; j <- i until dim)
        yield (i, j, acc(i * dim + j))).iterator
    }.toDF("i", "j", "partial")
      .groupBy("i", "j").agg(sum("partial").as("s"))
  }
}
