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
  /** D103 — dimension-truncation recall audit (the matryoshka
    * question: how much of exact top-k survives if search uses only
    * the first d′ dimensions? — the number that decides whether a
    * prefix-truncated index, at 1/4 the bytes and FLOPs, is safe to
    * deploy). For each d′ in `dims`, exact grid-L2 top-k on the
    * d′-prefix is compared against full-dimension exact top-k per
    * query; hits and integer recall_pct come back per (query, d′).
    *
    * One corpus pass: every truncated distance is a prefix-slice fold
    * computed alongside the full distance in the same projection, so
    * |dims| audits cost one broadcast-queries scan, not |dims| scans.
    * Integer-exact on the floor(x·256) grid — replayable in SQL.
    */
  def truncationRecallAudit(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Seq[Int],
      queryMod: Int = 1, sampleSeed: Long = 42L): DataFrame = {
    require(dims.nonEmpty && k > 0, "invalid audit parameters")
    require(queryMod >= 1, "queryMod must be >= 1")
    // Same audit-economics contract as Pq.recallAudit: each query is
    // one broadcast-join pass over the corpus, so a deterministic
    // 1-in-mod seeded-md5 query sample (oracle-replayable) bounds the
    // audit cost; mod = 1 keeps the full query set.
    val sampled = if (queryMod <= 1) queries else queries.filter(
      Sampling.hashMod(sampleSeed, col(idCol)) % queryMod === 0)
    val grid = (c: org.apache.spark.sql.Column) =>
      transform(c, x => floor(x.cast("double") * 256d).cast("long"))
    val q = sampled.select(col(idCol).as("qid"), grid(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), grid(col(vecCol)).as("cv"))
    def distPrefix(d: Int) = aggregate(
      zip_with(slice(col("qv"), 1, d), slice(col("cv"), 1, d),
        (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, t) => acc + t)
    val fullDist = aggregate(
      zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, t) => acc + t)
    val pairs = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(Seq(col("qid"), col("cid"), fullDist.as("__df")) ++
        dims.map(d => distPrefix(d).as(s"__d$d")): _*)
      .localCheckpoint() // one corpus pass feeds |dims|+1 rankings
    def topk(distCol: String) = {
      val w = Window.partitionBy("qid").orderBy(col(distCol), col("cid"))
      pairs.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k).select("qid", "cid")
    }
    val full = topk("__df").withColumn("__hit", lit(1L))
    dims.map { d =>
      topk(s"__d$d")
        .join(full, Seq("qid", "cid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
        .select(col("qid"), lit(d).as("dim"), col("n_hit"),
          expr(s"n_hit * 100 div $k").as("recall_pct"))
    }.reduce(_ unionByName _)
  }

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

  /** D121 — MULTI-PROBE sign-bucket ANN (Lv et al. VLDB'07 applied to
    * the hyperplane code): each query scans its own bucket PLUS every
    * Hamming-1 neighbor (the buckets one sign flip away — exactly
    * where near-boundary neighbors land), recovering most of the
    * recall single-bucket probing loses WITHOUT adding hash tables or
    * re-partitioning the corpus. Probe cost is (bits+1)/2^bits of the
    * corpus instead of 1/2^bits — the standard recall/latency knob on
    * a bucketed layout, chosen at QUERY time (the stored corpus is
    * untouched, same write-time bucketing as the single-probe path).
    * Each (query, candidate) pair arises from exactly one probe (a
    * candidate has one bucket), so no dedup step is needed.
    */
  def knnLshMultiProbe(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
      .withColumn("probe", signBucket(col("cv"), bits))
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
      .withColumn("bucket", signBucket(col("qv"), bits))
      .withColumn("probe", explode(array(
        (Seq(col("bucket")) ++
          (0 until bits).map(i => col("bucket").bitwiseXOR(lit(1 << i)))): _*)))
      .drop("bucket")
    val scored = c.join(broadcast(q), Seq("probe"))
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
  /** Shared IVF quantizer training: normalize, take a seeded
    * hash-ordered sample to the driver (one TakeOrdered pass — at
    * 100 TB this reads the corpus once and ships only `trainSample`
    * unit vectors; an iterative distributed fit would cost ~2·iters
    * full-corpus jobs for a tiny model), run local k-means. Returns
    * the (cid, cv, cn) projection and the trained centroids.
    * `writeIvfIndex` and `knnIvf` MUST share this so the on-disk and
    * in-memory cell structures agree.
    */
  private def trainQuantizer(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, seed: Long, trainSample: Int): (DataFrame, Array[Array[Double]]) = {
    // cluster on UNIT vectors: euclidean cells over normalized points
    // are cosine cells, so probing matches the similarity metric
    val c = corpus.select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val train = c
      .select(transform(col("cv"), x => x / col("cn")).as("uv"),
        xxhash64(col("cid"), lit(seed)).as("__h"))
      .orderBy("__h")
      .limit(trainSample)
      .collect().map(_.getSeq[Double](0).toArray)
    (c, localKMeans(train, nLists, seed, iters = 15))
  }

  def knnIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int, nProbe: Int,
      seed: Long = 42L, trainSample: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    val (c, centroids) = trainQuantizer(corpus, idCol, vecCol, nLists, seed, trainSample)
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    // corpus-side cell assignment is the one full-corpus pass of this
    // operator — a codegen'd expression, NOT a UDF (which would box
    // every vector into Seq[Double] and dominate the job at 100 TB)
    val probeCells = udf { (qv: Seq[Double], qn: Double) =>
      nearestCellsTo(bcCentroids.value, qv, qn, nProbe)
    }
    val assigned = c.withColumn("cell",
      graft.functions.NearestCell.nearestCell(col("cv"), col("cn"), centroids))
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

  /** D7++ — persist the corpus as an on-disk IVF index: rows land in
    * parquet partitions keyed by their cell, centroids ride along as a
    * `_centroids` side table. At 100 TB a probe then READS only
    * `nProbe/nLists` of the data — the cell filter is a partition
    * filter (directory pruning at the file index, before any IO), and
    * no corpus shuffle ever happens because the layout IS the index.
    */
  def writeIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, dir: String, seed: Long = 42L, trainSample: Int = 4096): Unit =
      CellCommit.withMaintenanceLease(corpus.sparkSession, dir) {
    val spark = corpus.sparkSession
    // a REBUILD discards staged-delete residue from any previous
    // index in this dir — a leftover committed journal must never be
    // re-applied over the fresh cells by the next probe's recovery
    CellCommit.clearStaged(spark, s"$dir/corpus")
    val (c, centroids) = trainQuantizer(corpus, idCol, vecCol, nLists, seed, trainSample)
    c.withColumn("cell",
        graft.functions.NearestCell.nearestCell(col("cv"), col("cn"), centroids))
      // hash-distribute by cell before the partitioned write (guide
      // §6, the TextIndex/ShardExport discipline, applied here r16):
      // without it every input partition lands a file in every cell
      // dir — tasks×cells tiny files vs one ~cell-sized file each
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/corpus")
    import spark.implicits._
    centroids.zipWithIndex.map { case (ctr, i) => (i, ctr.toSeq) }
      .toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** D7++ (append phase) — add a new vector batch to an EXISTING index
    * without retraining or rewriting: the stored centroid side table
    * IS the quantizer, the batch is assigned with the same codegen'd
    * NearestCell expression, and the cell-partitioned append touches
    * only the new rows' partition directories. This is the daily index
    * maintenance path at 100 TB — ingest cost scales with the batch,
    * not the corpus, and a rebuild is only ever needed when the
    * quantizer itself should drift. Probing the appended index at any
    * width is exact over old+new rows because cell routing depends
    * only on the (unchanged) centroids.
    */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVecs: DataFrame, idCol: String, vecCol: String): Unit =
      CellCommit.withMaintenanceLease(spark, dir) {
    // finish (or roll back) a crashed staged delete before appending
    // into the cell dirs it may be about to swap
    CellCommit.recover(spark, s"$dir/corpus")
    val centroids = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    newVecs.select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
      .withColumn("cell",
        graft.functions.NearestCell.nearestCell(col("cv"), col("cn"), centroids))
      // one file per touched cell per append, not one per (input
      // partition × cell) — see writeIvfIndex (r16)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/corpus")
  }

  /** D7++ (delete phase) — remove vectors from an on-disk IVF index
    * by id, rewriting ONLY the touched cell directories (the D52
    * MERGE discipline applied to the index layout), CRASH-ATOMICALLY
    * (round 14): survivors of the touched cells stage into
    * `corpus__delta`, a one-file journal records touched + emptied
    * cells and is the commit point, and per-cell renames apply it —
    * [[CellCommit]] documents the protocol and its recovery, which
    * every probe/append/delete runs first, so readers see either the
    * old or the new index, never a mix. Cells the delete doesn't
    * touch are never read or written. Centroids are untouched: the
    * quantizer routes by geometry, not membership, so probes of the
    * shrunk index stay exact. Idempotent — re-removing absent ids is
    * a no-op.
    */
  def removeDocsFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, ids: DataFrame, idCol: String): Unit =
    CellCommit.withMaintenanceLease(spark, dir) {
      CellCommit.deleteIds(spark, s"$dir/corpus",
        ids.select(col(idCol).as("cid")).distinct())
    }

  /** Probe a written IVF index: the query batch's probe cells become
    * ONE `cell IN (...)` partition filter — directories outside the
    * probed cells are never listed, read, or shuffled.
    */
  def knnIvfIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    // repair-before-read: a probe must see either the pre-delete or
    // the post-delete index, never a half-applied cell swap — and
    // must never roll back an in-flight delete's staging
    CellCommit.repairForRead(spark, s"$dir/corpus")
    val centroids = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val bcCentroids = spark.sparkContext.broadcast(centroids)
    val probeCells = udf { (qv: Seq[Double], qn: Double) =>
      nearestCellsTo(bcCentroids.value, qv, qn, nProbe)
    }
    // materialize the (small, broadcastable-by-contract) probe side
    // ONCE: both the partition-filter cell set and the join input come
    // from this collect — re-deriving them from the plan would run the
    // query scan + probe UDF twice
    val qRows = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
      .withColumn("cell", explode(probeCells(col("qv"), col("qn"))))
      .collect()
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid",
        queries.schema(idCol).dataType, nullable = false),
      org.apache.spark.sql.types.StructField("qv",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType), nullable = false),
      org.apache.spark.sql.types.StructField("qn",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val q = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qSchema)
    // the union of probe cells over the query BATCH, as a partition filter
    val cells = qRows.map(_.getAs[Int]("cell")).distinct.toSeq
    val corpus = spark.read.parquet(s"$dir/corpus")
      .filter(col("cell").isin(cells: _*))
    val scored = corpus.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "rk", "sim")
  }

  /** D93 — hard-negative mining for contrastive training (the
    * DPR/dense-retriever recipe, Karpukhin et al. EMNLP'20): for each
    * anchor, the top-k most-similar vectors BELOW a near-duplicate
    * ceiling. Neighbors above the ceiling are positives in disguise —
    * training on them as negatives poisons the objective — so the
    * ceiling carves the informative band: close enough to be hard,
    * far enough to be true negatives. The exact-scan sibling of
    * knnBruteForce (same broadcast-query shape, same fold-order
    * double cosine, so the same oracle family applies); at corpus
    * scale route through the IVF/PQ index first and band-filter the
    * probed candidates.
    *
    * @return (qid, cid, sim, rk) for rk ≤ k within the band
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, ceiling: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("qid"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .filter(col("sim") < ceiling)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "sim", "rk")
  }

  /** Indices of the `n` nearest centroids to `v/nrm` by euclidean
    * distance (== cosine order on unit vectors).
    */
  private def nearestCellsTo(cs: Array[Array[Double]], v: Seq[Double],
      nrm: Double, n: Int): Seq[Int] =
    cs.indices.map { idx =>
      val ctr = cs(idx)
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) / nrm - ctr(i); d += t * t; i += 1 }
      (idx, d)
    }.sortBy(_._2).take(n).map(_._1)

  /** Driver-local Lloyd's k-means with seeded k-means++ init — the
    * IVF quantizer trainer. k·dim·n per iteration on ≤ trainSample
    * points: microseconds, deterministic under the seed, no cluster
    * jobs.
    */
  private[operators] def localKMeans(points: Array[Array[Double]], k: Int, seed: Long,
      iters: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "kmeans needs a non-empty training sample")
    val rng = new scala.util.Random(seed)
    val n = points.length
    val kk = math.min(k, n)
    val dim = points(0).length

    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0
      var i = 0
      while (i < dim) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }
    // k-means++ seeding: each next center drawn ∝ distance² to the
    // nearest already-chosen center
    val centers = scala.collection.mutable.ArrayBuffer(points(rng.nextInt(n)).clone)
    val d2 = Array.fill(n)(Double.MaxValue)
    while (centers.size < kk) {
      val last = centers.last
      var sum = 0.0
      var i = 0
      while (i < n) {
        val d = sqDist(points(i), last)
        if (d < d2(i)) d2(i) = d
        sum += d2(i); i += 1
      }
      var r = rng.nextDouble() * sum
      var idx = 0
      while (idx < n - 1 && r > d2(idx)) { r -= d2(idx); idx += 1 }
      centers += points(idx).clone
    }
    var cs = centers.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var cIdx = 0
        while (cIdx < kk) {
          val d = sqDist(points(i), cs(cIdx))
          if (d < bestD) { bestD = d; best = cIdx }
          cIdx += 1
        }
        val s = sums(best)
        val p = points(i)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      cs = Array.tabulate(kk) { cIdx =>
        if (counts(cIdx) == 0) cs(cIdx) // empty cell keeps its center
        else {
          val s = sums(cIdx)
          val out = new Array[Double](dim)
          var j = 0
          while (j < dim) { out(j) = s(j) / counts(cIdx); j += 1 }
          out
        }
      }
    }
    cs
  }
}
