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

  /** D77 — dominant principal direction by POWER ITERATION over the
    * Gram table (the top-PCA step of embedding whitening/compression,
    * Mises & Pollaczek-Geiringer 1929): v ← G·v, renormalized each
    * round by the CURRENT max |component| via integral division — the
    * HITS renorm trick, so every iterate is exact integer arithmetic
    * an independent engine replays (float power iteration drifts by
    * reduction order). The Gram is PSD, so iterates converge toward
    * the top eigenvector; the all-ones start is deterministic.
    *
    * Scale shape: the iteration state is ONE dim-row vector; each
    * round is a dim²-row join + map-side-partial sum keyed by i, plus
    * a broadcast single-row max — nothing corpus-sized is touched
    * after the one gramInt8 pass. Overflow bound:
    * dim·maxG·scale² must stay under 2⁶³ (maxG ≤ 127²·n_vectors).
    *
    * @param gram upper-triangle (i, j, s) as produced by [[gramInt8]]
    * @return (dim_idx, v) — components at `scale`
    */
  def powerIteration(gram: DataFrame, dim: Int, iters: Int,
      scale: Long = 10000L): DataFrame = {
    val spark = gram.sparkSession
    val full = gram.select(col("i"), col("j"), col("s"))
      .union(gram.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("s")))
      .localCheckpoint() // reused every iteration
    var v = spark.range(dim)
      .select(col("id").cast("int").as("j"), lit(scale).as("v"))
    for (_ <- 1 to iters) {
      v = powerRound(full, v, scale).localCheckpoint()
    }
    v.select(col("j").as("dim_idx"), col("v")).orderBy("dim_idx")
  }

  /** D129 — "all-but-the-top" embedding post-processing (Mu &
    * Viswanath, ICLR'18, the top-1 variant): remove the dominant
    * principal direction from every vector — the standard fix for
    * anisotropic embedding spaces where one direction carries a
    * corpus-wide bias component and drowns cosine contrast. Exact
    * integers end-to-end: on the int8-quantized representation with
    * the direction `u` at the power-iteration scale, the residual is
    *
    *   r = q·(u·u) − u·(q·u)
    *
    * which is the true residual times the positive scalar (u·u) — so
    * downstream cosine ORDERING is unchanged while every component
    * stays a Long both engines reproduce bit-for-bit, and r·u = 0
    * holds exactly (spec-pinned). Plan shape: `u` is a dim-length
    * literal array (driver-bounded, from [[powerIteration]]'s
    * dim-row result); the removal itself is a pure zip_with
    * projection — zero exchanges.
    */
  def removeTopDirection(emb: DataFrame, idCol: String, vecCol: String,
      direction: Array[Long]): DataFrame = {
    require(direction.nonEmpty, "empty direction")
    val uu = direction.map(x => x * x).sum
    val uArr = array(direction.map(lit(_)): _*)
    Prep.quantizeInt8(emb, idCol, vecCol)
      .withColumn("__u", uArr)
      .withColumn("dot",
        aggregate(zip_with(col("q"), col("__u"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("__r",
        zip_with(col("q"), col("__u"), (a, b) => a * lit(uu) - b * col("dot")))
      .select(col(idCol), col("dot"),
        aggregate(col("__r"), lit(0L), (acc, x) => acc + x).as("r_sum"),
        array_min(col("__r")).as("r_min"),
        array_max(col("__r")).as("r_max"))
  }

  /** One v←G·v round (uncheckpointed — PlanSpec asserts its shape:
    * dim-keyed partial-agg matvec, broadcast single-row max renorm).
    */
  private[graft] def powerRound(full: DataFrame, v: DataFrame,
      scale: Long): DataFrame = {
    val w = full.join(v, "j")
      .groupBy(col("i")).agg(sum(col("s") * col("v")).as("w"))
    w.crossJoin(broadcast(w.agg(max(abs(col("w"))).as("__mx"))))
      .select(col("i").as("j"), expr(s"w * $scale div __mx").as("v"))
  }
}
