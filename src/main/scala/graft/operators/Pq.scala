package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization for ANN search (Jégou, Douze & Schmid, TPAMI
  * 2011 — "Product Quantization for Nearest Neighbor Search"): split
  * each d-dim embedding into `m` subvectors of d/m dims, learn a
  * `ksub`-entry codebook per subspace, store each vector as m small
  * codes. An ADC (asymmetric distance computation) scan then ranks the
  * whole corpus from a per-query lookup table without ever touching the
  * raw vectors — the memory-bound trick that makes billion-vector ANN
  * feasible: at m=8/ksub=16 a 64-float embedding (256 B) becomes 8
  * codes (8 B), a 32× footprint cut, so 100 TB of raw embeddings scan
  * as ~3 TB of codes.
  *
  * Integer-exact variant (the D28/D49 discipline): vectors land on the
  * floor(x·256) integer grid BEFORE training and encoding, codebook
  * centroids are floored to the same grid, and every distance is a
  * BIGINT sum of squares — so code assignment and the full ADC ranking
  * replay bit-for-bit in an independent SQL engine reading the written
  * codebook. Training itself (driver-local seeded k-means on a ≤
  * `trainSample` hash-ordered sample, the IVF trainQuantizer shape)
  * need not replay: the codebook parquet IS the contract.
  *
  * Scale shape: ONE full-corpus pass to encode (m codegen'd
  * NearestCentroid argmin loops in a single projection — no UDF, no
  * shuffle), codes written once; a search scans ONLY the code table,
  * joins a broadcast (qid, sub, code, d2) lookup table built
  * driver-side from the query batch (|Q|·m·ksub rows), and reduces
  * through one map-side-partial (qid, cid) sum. No corpus shuffle at
  * any point; the per-query state is the kilobyte lookup table.
  */
object Pq {

  /** Quantization grid shared by training, encoding, and search:
    * component → floor(x·256) as BIGINT. ·256 is a power of two, so
    * the float→double widening and the multiply are both exact — every
    * engine floors the identical double.
    */
  private def quantized(vecCol: String): org.apache.spark.sql.Column =
    transform(col(vecCol), x => floor(x.cast("double") * 256d).cast("long"))

  private def quantize(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 256d).toLong).toArray

  /** Train per-subspace codebooks on a seeded hash-ordered driver
    * sample (≤ `trainSample` vectors — one corpus TakeOrdered pass at
    * any scale). Returns [sub][code][j] integer centroids, floored to
    * the same grid as the vectors.
    */
  def trainCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, seed: Long, trainSample: Int): Array[Array[Array[Long]]] = {
    val sample = corpus
      .select(quantized(vecCol).as("qv"), xxhash64(col(idCol), lit(seed)).as("__h"))
      .orderBy("__h")
      .limit(trainSample)
      .collect().map(_.getSeq[Long](0).toArray)
    require(sample.nonEmpty, "pq training needs a non-empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => v.slice(s * dsub, (s + 1) * dsub).map(_.toDouble))
      Similarity.localKMeans(sub, ksub, seed + s, iters = 15)
        .map(_.map(math.floor(_).toLong))
    }
  }

  /** Build and persist the PQ index: `dir/codebook` = (sub, code,
    * centroid array<bigint>) — m·ksub rows, the whole model;
    * `dir/codes` = (cid, codes array<int>) — the 32×-compressed corpus.
    * Encoding is one projection over the corpus: per subspace a
    * codegen'd integer NearestCentroid argmin (ties → lowest code) on
    * the slice()d quantized vector.
    */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, dir: String, seed: Long = 42L,
      trainSample: Int = 2048): Unit =
      CellCommit.withMaintenanceLease(corpus.sparkSession, dir) {
    val spark = corpus.sparkSession
    // a rebuild discards a stale flat-codes staging: a leftover
    // COMPLETE codes__staging from the previous index's crashed
    // delete must never be republished over the fresh codes table
    CellCommit.clearStagedFlat(spark, s"$dir/codes")
    val cb = trainCodebook(corpus, idCol, vecCol, m, ksub, seed, trainSample)
    val dsub = cb(0)(0).length
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (codes, s) =>
      codes.zipWithIndex.map { case (ctr, c) => (s, c, ctr.toSeq) }
    }.toSeq.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
    val q = corpus.select(col(idCol).as("cid"), quantized(vecCol).as("qv"))
    val codeCols = (0 until m).map { s =>
      graft.functions.NearestCentroid.nearestCentroid(
        slice(col("qv"), s * dsub + 1, dsub), cb(s))
    }
    q.select(col("cid"), array(codeCols: _*).as("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** IVF-PQ — the composed billion-scale layout (Jégou et al. TPAMI'11
    * §IV; the architecture behind FAISS's IndexIVFPQ): a coarse
    * quantizer routes each vector to one of `nLists` cells, and PQ
    * encodes the RESIDUAL (vector − cell centroid) — residuals
    * concentrate near zero, so the same code budget buys far less
    * quantization error than flat PQ. On disk the code table is
    * PARTITIONED BY CELL: a probe reads nProbe/nLists of an already
    * 32×-compressed table via directory pruning, never touches a raw
    * vector, and shuffles nothing corpus-sized — the 100 TB ANN
    * endgame combining D7++'s partition filter with D88's ADC scan.
    *
    * Integer-exact end to end: grid quantization, coarse centroids and
    * sub-codebooks floored to the grid, residuals are exact integer
    * subtractions, distances BIGINT sums — cell routing, encoding, and
    * the ADC ranking all replay in SQL from the written model tables.
    */
  def writeIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, m: Int, ksub: Int, dir: String, seed: Long = 42L,
      trainSample: Int = 2048): Unit =
      CellCommit.withMaintenanceLease(corpus.sparkSession, dir) {
    val spark = corpus.sparkSession
    // a rebuild discards staged-delete residue (see writeIvfIndex)
    CellCommit.clearStaged(spark, s"$dir/codes")
    val sample = corpus
      .select(quantized(vecCol).as("qv"), xxhash64(col(idCol), lit(seed)).as("__h"))
      .orderBy("__h")
      .limit(trainSample)
      .collect().map(_.getSeq[Long](0).toArray)
    require(sample.nonEmpty, "ivfpq training needs a non-empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    // coarse quantizer on the grid (train in doubles, floor once)
    val coarse = Similarity.localKMeans(sample.map(_.map(_.toDouble)),
      nLists, seed, iters = 15).map(_.map(math.floor(_).toLong))
    // per-subspace codebooks on the sample's RESIDUALS
    val resSample = sample.map { v =>
      val c = coarse(nearestTo(coarse, v))
      Array.tabulate(dim)(i => v(i) - c(i))
    }
    val cb = Array.tabulate(m) { s =>
      Similarity.localKMeans(
        resSample.map(r => r.slice(s * dsub, (s + 1) * dsub).map(_.toDouble)),
        ksub, seed + 1 + s, iters = 15).map(_.map(math.floor(_).toLong))
    }
    import spark.implicits._
    coarse.zipWithIndex.map { case (ctr, cell) => (cell, ctr.toSeq) }
      .toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/coarse")
    cb.zipWithIndex.flatMap { case (codes, s) =>
      codes.zipWithIndex.map { case (ctr, c) => (s, c, ctr.toSeq) }
    }.toSeq.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
    // ONE corpus pass: grid quantize -> cell route -> integer residual
    // -> m argmin loops; land partitioned by cell
    val q = corpus.select(col(idCol).as("cid"), quantized(vecCol).as("qv"))
      .withColumn("cell",
        graft.functions.NearestCentroid.nearestCentroid(col("qv"), coarse))
    val withRes = q.withColumn("res", resTo(col("qv"), col("cell"), coarse))
    val codeCols = (0 until m).map { s =>
      graft.functions.NearestCentroid.nearestCentroid(
        slice(col("res"), s * dsub + 1, dsub), cb(s))
    }
    withRes.select(col("cid"), col("cell"), array(codeCols: _*).as("codes"))
      // hash-distribute by cell before the partitioned write (guide
      // §6) — one ~cell-sized file per cell instead of tasks×cells
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
  }

  /** Integer residual to the row's own cell centroid: a codegen'd
    * zip_with over two array columns (the centroid array is selected
    * from a plan-shipped literal by cell index — element_at on an
    * array-of-arrays literal).
    */
  private def resTo(qv: org.apache.spark.sql.Column,
      cell: org.apache.spark.sql.Column,
      coarse: Array[Array[Long]]): org.apache.spark.sql.Column = {
    val table = array(coarse.map(c => array(c.map(lit): _*)): _*)
    zip_with(qv, element_at(table, cell + 1), (x, c) => x - c)
  }

  private def nearestTo(cs: Array[Array[Long]], v: Array[Long]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0L
      var j = 0
      while (j < v.length) { val t = v(j) - cs(c)(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Append a new vector batch to an EXISTING IVF-PQ index without
    * retraining or rewriting (the appendIvfIndex economics at the
    * compressed layout): the stored coarse centroids + sub-codebooks
    * ARE the model, the batch is routed/residual-encoded with the same
    * one-projection plan, and the cell-partitioned append touches only
    * the new rows' directories. Probing afterwards is exact over
    * old+new because routing and encoding depend only on the
    * (unchanged) stored tables.
    */
  def appendIvfPqIndex(spark: SparkSession, dir: String, newVecs: DataFrame,
      idCol: String, vecCol: String): Unit =
      CellCommit.withMaintenanceLease(spark, dir) {
    // finish (or roll back) a crashed staged delete before appending
    // into the cell dirs it may be about to swap
    CellCommit.recover(spark, s"$dir/codes")
    val coarse = spark.read.parquet(s"$dir/coarse")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1).map(_._2)
    val cbRows = spark.read.parquet(s"$dir/codebook")
      .select("sub", "code", "centroid").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val ksub = cbRows.map(_.getInt(1)).max + 1
    val cb = Array.ofDim[Array[Long]](m, ksub)
    cbRows.foreach(r => cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray)
    val dsub = cb(0)(0).length
    val q = newVecs.select(col(idCol).as("cid"), quantized(vecCol).as("qv"))
      .withColumn("cell",
        graft.functions.NearestCentroid.nearestCentroid(col("qv"), coarse))
    val withRes = q.withColumn("res", resTo(col("qv"), col("cell"), coarse))
    val codeCols = (0 until m).map { s =>
      graft.functions.NearestCentroid.nearestCentroid(
        slice(col("res"), s * dsub + 1, dsub), cb(s))
    }
    withRes.select(col("cid"), col("cell"), array(codeCols: _*).as("codes"))
      // one file per touched cell per append — see writeIvfPqIndex (r16)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
  }

  /** DELETE from the flat PQ index (the index family's round-13 "out"
    * story): a staged survivor rewrite of the codes table swapped in
    * by atomic rename. The codes table is the 32×-compressed
    * representation — a full rewrite costs a scan of the compressed
    * rows, not the corpus — and a physical rewrite keeps the ADC scan
    * untouched (no probe-side filter). The codebook never changes:
    * removal does not retrain, exactly like the IVF centroid
    * contract. Idempotent; a crash between a completed staging write
    * and the swap republishes on the next call.
    */
  /** Finish (or discard) a flat-codes publish a previous delete died
    * inside — a COMPLETE staging republishes (it may hold the only
    * copy if the crash hit between delete(live) and rename), an
    * incomplete one drops. Idempotent; run before every flat read
    * and delete.
    */
  // flat-codes recovery delegates to the family-shared staged-publish
  // protocol (CellCommit) — probe side never deletes, writer side
  // also discards crash residue
  private def repairFlatCodesForRead(spark: SparkSession, dir: String): Unit =
    CellCommit.repairMissingLive(spark, s"$dir/codes")

  private def recoverFlatCodes(spark: SparkSession, dir: String): Unit =
    CellCommit.recoverStagedPublish(spark, s"$dir/codes")

  def removeDocsFromIndex(spark: SparkSession, dir: String,
      ids: DataFrame, idCol: String): Unit =
      CellCommit.withMaintenanceLease(spark, dir) {
    val live = new org.apache.hadoop.fs.Path(s"$dir/codes")
    val staging = new org.apache.hadoop.fs.Path(s"$dir/codes__staging")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverFlatCodes(spark, dir)
    spark.read.parquet(live.toString)
      .join(broadcast(ids.select(col(idCol).as("cid")).distinct()),
        Seq("cid"), "left_anti")
      .write.mode("errorifexists").parquet(staging.toString)
    // family-shared commit: swap under the SAME per-live-path lock
    // the probe repair uses (a dir-keyed lock would not exclude it)
    CellCommit.publishStaged(spark, s"$dir/codes")
  }

  /** DELETE from the IVF-PQ index: the D52 touched-cell discipline,
    * crash-atomic since round 14 — survivors of the touched cells
    * stage into `codes__delta`, a journal is the commit point, and
    * per-cell renames apply it ([[CellCommit]] has the protocol +
    * recovery; probes/appends repair before reading, so they see the
    * old or the new index, never a mix). Coarse centroids and
    * codebooks never change (routing is geometric, not
    * membership-based), so probes of the shrunk index stay exact.
    */
  def removeDocsFromIvfPqIndex(spark: SparkSession, dir: String,
      ids: DataFrame, idCol: String): Unit =
    CellCommit.withMaintenanceLease(spark, dir) {
      CellCommit.deleteIds(spark, s"$dir/codes",
        ids.select(col(idCol).as("cid")).distinct())
    }

  /** Probe a written IVF-PQ index: per query pick the `nProbe` nearest
    * coarse cells (ties → lowest cell), build the per-(cell, sub,
    * code) residual distance table driver-side (|Q|·nProbe·m·ksub
    * rows, broadcast), and ADC-rank ONLY the probed cells' members —
    * the cell set is a parquet partition filter, so unprobed
    * directories are never listed or read.
    *
    * @return (qid, cid, adist, rk) for rk ≤ k
    */
  def searchIvfPq(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    // repair-before-read: finish a COMMITTED staged cell delete (see
    // old or new, never a mix) without rolling back an in-flight one
    CellCommit.repairForRead(spark, s"$dir/codes")
    val coarse = spark.read.parquet(s"$dir/coarse")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1).map(_._2)
    val cbRows = spark.read.parquet(s"$dir/codebook")
      .select("sub", "code", "centroid").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val ksub = cbRows.map(_.getInt(1)).max + 1
    val cb = Array.ofDim[Array[Long]](m, ksub)
    cbRows.foreach(r => cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray)
    val dsub = cb(0)(0).length
    val qRows = queries.select(col(idCol).as("qid"), col(vecCol).as("qv")).collect()
    val dtab = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val qv = quantize(r.getSeq[Float](1))
      // nProbe nearest cells by integer distance, ties -> lowest cell
      val cells = coarse.indices.map { cell =>
        var d = 0L
        var j = 0
        while (j < qv.length) { val t = qv(j) - coarse(cell)(j); d += t * t; j += 1 }
        (d, cell)
      }.sorted.take(nProbe).map(_._2)
      for (cell <- cells; s <- 0 until m; c <- 0 until ksub) yield {
        // residual of the QUERY against this probed cell's centroid
        var d = 0L
        var j = 0
        while (j < dsub) {
          val t = (qv(s * dsub + j) - coarse(cell)(s * dsub + j)) - cb(s)(c)(j)
          d += t * t
          j += 1
        }
        (qid, cell, s, c, d)
      }
    }
    import spark.implicits._
    val dtabDf = dtab.toSeq.toDF("qid", "cell", "sub", "code", "d2")
    val cells = dtab.map(_._2).distinct.toSeq
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isin(cells: _*)) // partition filter: directory pruning
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adist"), col("cid"))
    codes
      .select(col("cid"), col("cell"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(dtabDf), Seq("cell", "sub", "code"))
      .filter(col("cid") =!= col("qid"))
      .groupBy("qid", "cid")
      .agg(sum("d2").as("adist"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "adist", "rk")
  }

  /** Exact integer squared L2 between two grid-quantized vectors —
    * one codegen'd zip_with/aggregate fold, no UDF.
    */
  private def intSqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, t) => acc + t)

  /** D96 — two-stage ANN: ADC shortlist → EXACT re-rank (the
    * production recipe behind every deployed PQ system: compressed
    * codes rank cheaply but lossily, so the top-`shortlist` ADC
    * candidates are re-scored against their RAW vectors and only then
    * cut to k — recall of near-exact search at ~shortlist/|corpus| of
    * its cost). At 100 TB the point is the read pattern: stage 1
    * touches only the 32×-compressed code table; stage 2 reads raw
    * vectors for |Q|·shortlist ids via a broadcast semi-join prune —
    * the full-width corpus is never scanned, joined, or shuffled.
    *
    * Integer-exact: the re-rank distance is the BIGINT squared L2 on
    * the same floor(x·256) grid the codes were trained on, so an SQL
    * oracle replays shortlist AND re-rank bit-for-bit.
    */
  def searchRerank(spark: SparkSession, dir: String, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k $k")
    // bounded |Q|·shortlist rows; two consumers (id prune + re-rank join)
    val cand = search(spark, dir, queries, idCol, vecCol, shortlist)
      .select("qid", "cid").localCheckpoint()
    val candVecs = corpus
      .select(col(idCol).as("cid"), quantized(vecCol).as("cv"))
      .join(broadcast(cand.select("cid").distinct()), Seq("cid"), "left_semi")
    val qv = queries.select(col(idCol).as("qid"), quantized(vecCol).as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("edist"), col("cid"))
    cand
      .join(candVecs, "cid")
      .join(broadcast(qv), "qid")
      .withColumn("edist", intSqDist(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "edist", "rk")
  }

  /** D97 — ANN recall audit: measure recall@k of the PQ index against
    * EXACT top-k, in-engine ("measure, don't guess" applied to the
    * index itself — the number that decides nProbe/m/ksub before you
    * trust the index at scale). Per query: the exact grid-L2 top-k
    * (ties → lowest cid, the engine-wide convention), the ADC top-k,
    * and the hit count / recall as integers.
    *
    * Scale shape: exact ground truth is one broadcast-queries pass
    * over the corpus (|Q| is the audit's sample size, bounded by
    * contract); the audit is run on a sampled query set, not the full
    * corpus — recall is a statistic, not a per-row transform.
    */
  def recallAudit(spark: SparkSession, dir: String, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      queryMod: Int = 1, sampleSeed: Long = 42L): DataFrame = {
    require(queryMod >= 1, "queryMod must be >= 1")
    // At 100 TB each audited query costs one corpus pass for exact
    // ground truth — recall is a statistic, so a deterministic 1-in-mod
    // query sample (seeded md5 over the id, replayable by the oracle)
    // bounds the audit at O(|Q|/mod) corpus passes. mod = 1 audits the
    // full provided query set.
    val qs = if (queryMod <= 1) queries else queries.filter(
      Sampling.hashMod(sampleSeed, col(idCol)) % queryMod === 0)
    val approx = search(spark, dir, qs, idCol, vecCol, k)
      .select(col("qid"), col("cid"), lit(1L).as("__hit"))
    val qv = qs.select(col(idCol).as("qid"), quantized(vecCol).as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("edist"), col("cid"))
    val exact = corpus
      .select(col(idCol).as("cid"), quantized(vecCol).as("cv"))
      .join(broadcast(qv), col("cid") =!= col("qid"))
      .withColumn("edist", intSqDist(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid")
    exact.join(approx, Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_pct", expr("n_hit * 100 div n_exact"))
      .select("qid", "n_exact", "n_hit", "recall_pct")
  }

  /** ADC top-k over a written index: quantize the query batch
    * driver-side, build the (qid, sub, code, d2) asymmetric-distance
    * lookup table (|Q|·m·ksub rows — broadcast by contract), scan the
    * CODE table only, and rank by the BIGINT sum of per-subspace table
    * entries (ties → lowest cid). The corpus-side plan is
    * scan → posexplode(m codes) → broadcast join → partial-agg sum:
    * zero corpus shuffle beyond the (qid, cid)-keyed reduce of
    * fixed-width rows.
    *
    * @return (qid, cid, adist, rk) for rk ≤ k — adist is the exact
    *         integer ADC distance, so the oracle pins the arithmetic,
    *         not just the ordering
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    repairFlatCodesForRead(spark, dir)
    val cbRows = spark.read.parquet(s"$dir/codebook")
      .select("sub", "code", "centroid").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val ksub = cbRows.map(_.getInt(1)).max + 1
    val cb = Array.ofDim[Array[Long]](m, ksub)
    cbRows.foreach(r => cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray)
    val dsub = cb(0)(0).length
    val qRows = queries.select(col(idCol).as("qid"), col(vecCol).as("qv")).collect()
    val dtab = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val qv = quantize(r.getSeq[Float](1))
      require(qv.length == m * dsub,
        s"query dim ${qv.length} != index dim ${m * dsub}")
      for (s <- 0 until m; c <- 0 until ksub) yield {
        var d = 0L
        var j = 0
        while (j < dsub) {
          val t = qv(s * dsub + j) - cb(s)(c)(j)
          d += t * t
          j += 1
        }
        (qid, s, c, d)
      }
    }
    import spark.implicits._
    val dtabDf = dtab.toSeq.toDF("qid", "sub", "code", "d2")
    val codes = spark.read.parquet(s"$dir/codes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adist"), col("cid"))
    codes
      .select(col("cid"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(dtabDf), Seq("sub", "code"))
      .filter(col("cid") =!= col("qid"))
      .groupBy("qid", "cid")
      .agg(sum("d2").as("adist"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "adist", "rk")
  }
}
