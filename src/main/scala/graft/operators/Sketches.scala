package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D57 — persisted mergeable cardinality sketches: per-shard HLL
  * sketches (Spark's Apache DataSketches functions) written once
  * beside the corpus, so "how many distinct X" — overall or for any
  * shard subset — answers from the SKETCH TABLE (one tiny row per
  * shard) instead of a corpus-wide distinct. New shards append
  * without touching old rows: HLL register-max union is associative
  * and order-independent, the same algebra that makes the per-shard
  * aggregate map-side partial at build time.
  *
  * At 100 TB this is the difference between a metadata query and a
  * full-corpus exchange: exact distinct shuffles every key once per
  * question asked; the sketch table answers every subsequent
  * question at the cost of scanning |shards| kilobyte rows, with the
  * standard HLL error bound (~1.6% at the default lgK=12).
  *
  * Determinism caveat (spec-pinned): DataSketches sketch BYTES are
  * insertion-order-sensitive (sparse-mode internals), so estimates
  * from different build orders can differ within the error bound —
  * the contract is the bound, never byte equality. The gate folds
  * the estimate to a tolerance boolean for exactly this reason.
  */
object Sketches {

  /** One HLL sketch row per shard: (shard, n_rows, sketch). */
  def writeCardinalitySketches(docs: DataFrame, keyCol: String,
      shardCol: String, dir: String): Unit =
    docs.groupBy(col(shardCol).as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col(keyCol)).as("sketch"))
      .write.mode("append").parquet(dir)

  /** Distinct-count estimate from the persisted sketches — all
    * shards, or any subset — without touching the corpus.
    */
  def estimateDistinct(spark: SparkSession, dir: String,
      shards: Seq[Long] = Nil): Long = {
    val t = spark.read.parquet(dir)
    val s = if (shards.isEmpty) t else t.filter(col("shard").isin(shards: _*))
    s.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .head().getLong(0)
  }

  /** D65 — persisted mergeable HISTOGRAM sketch for quantile
    * dashboards: one (shard, bin, cnt) row set per shard with
    * fixed-width integer bins, written once beside the corpus. Any
    * later quantile question (p50/p95/p99 doc length — overall or
    * for a shard subset) answers from the sketch table: merge is
    * per-bin SUM (associative, order-independent, append-only — the
    * HLL union algebra with exact integers), so new shards append
    * without touching old rows and NOTHING corpus-sized is ever
    * rescanned. The answer is exact at bin resolution: the bin
    * containing the ceiling-rank element, with [lo, hi) bounds —
    * fully engine-replayable, unlike interpolated float quantiles.
    *
    * 100 TB shape: build = one map-side-partial aggregate to
    * |shards|·|bins| fixed-width rows; query = scan of that tiny
    * table, one window cumsum over |bins| rows, never the corpus.
    */
  /** The (shard, bin, cnt) reduction both the batch writer and the
    * E44 streaming monitor append: one map-side-partial aggregate to
    * |shards|·|bins| fixed-width rows.
    */
  def histogramShardRows(docs: DataFrame, valueCol: String,
      shardCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"invalid binWidth $binWidth")
    docs.select(col(shardCol).as("shard"),
        expr(s"CAST($valueCol AS BIGINT) div $binWidth").as("bin"))
      .groupBy("shard", "bin").agg(count(lit(1)).as("cnt"))
  }

  def writeHistogramSketch(docs: DataFrame, valueCol: String,
      shardCol: String, dir: String, binWidth: Long): Unit =
    histogramShardRows(docs, valueCol, shardCol, binWidth)
      .write.mode("append").parquet(dir)

  /** Quantile bins from the persisted sketch (all shards or a
    * subset): for each pct, the bin holding the ceiling-rank element
    * — rank = ⌈pct·total/100⌉, smallest bin with running cum ≥ rank.
    */
  def quantilesFromSketch(spark: SparkSession, dir: String, binWidth: Long,
      percentiles: Seq[Int], shards: Seq[Long] = Nil): DataFrame =
    quantilesFromRows(spark, spark.read.parquet(dir), binWidth, percentiles, shards)

  /** Same, over an explicit list of sketch directories (the streaming
    * epoch layout). Callers must pass CONCRETE paths, not a glob
    * string: `read.parquet("…/epoch_*")` makes Spark's
    * FileStreamSink.hasMetadata getFileStatus the literal glob, which
    * logs a benign-but-alarming FileNotFoundException stack trace
    * ("Assume no metadata directory") into every run's tail — the
    * unexplained trace the round-14 bench record shipped.
    */
  def quantilesFromSketchDirs(spark: SparkSession, dirs: Seq[String],
      binWidth: Long, percentiles: Seq[Int]): DataFrame = {
    require(dirs.nonEmpty, "no sketch directories to merge")
    quantilesFromRows(spark, spark.read.parquet(dirs: _*), binWidth, percentiles, Nil)
  }

  private def quantilesFromRows(spark: SparkSession, t: DataFrame, binWidth: Long,
      percentiles: Seq[Int], shards: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val sel = if (shards.isEmpty) t else t.filter(col("shard").isin(shards: _*))
    val merged = sel.groupBy("bin").agg(sum("cnt").as("cnt"))
    // running cum AND the grand total from the SAME window sort — the
    // sketch table is scanned exactly once (a separate total aggregate
    // would re-scan it per consumer)
    // unpartitioned by design: input = one row per histogram bin
    // (binWidth-bounded), pinned by PlanSpec "bounded prefix windows"
    val w = Window.orderBy("bin")
    val cum = merged.select(col("bin"),
      sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"),
      sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("total"))
    val pcts = percentiles.map(_.toLong).toDF("pct")
    broadcast(pcts)
      .join(cum, col("cum") >= expr("(pct * total + 99) div 100"))
      .groupBy("pct").agg(min("bin").as("bin"), min("total").as("total"))
      .select(col("pct"), col("bin"),
        (col("bin") * binWidth).as("lo"),
        ((col("bin") + 1) * binWidth).as("hi"),
        col("total"))
  }

  /** The gate surface: exact distinct (oracle-replayable) plus the
    * sketch-path estimate folded to a contract boolean — a drifting
    * estimate flips the boolean and breaks the row hash, without
    * ever asking the oracle to reproduce HLL internals.
    */
  def cardinalityCheck(docs: DataFrame, keyCol: String, shardCol: String,
      dir: String, tolerancePct: Int = 5): DataFrame = {
    writeCardinalitySketches(docs, keyCol, shardCol, dir)
    val est = estimateDistinct(docs.sparkSession, dir)
    docs.agg(countDistinct(col(keyCol)).as("n_exact"))
      .withColumn("estimate_ok",
        abs(lit(est) - col("n_exact")) * 100 <= col("n_exact") * tolerancePct)
  }

  // --- D134: KMV (k-minimum-values) distinct sketch -----------------

  /** The 48-bit portable value hash both engines compute identically:
    * Spark `conv(substr(md5(...), 1, 12), 16, 10)` == DuckDB
    * `('0x' || substr(md5(...), 1, 12))::BIGINT` (the established
    * §6 idiom). Uniform over [0, 2^48).
    */
  private def kmvHash(valueCol: String) =
    conv(substring(md5(col(valueCol).cast("string").cast("binary")), 1, 12),
      16, 10).cast("long")

  private val KmvRange = 1L << 48

  /** D134 — KMV (k-minimum-values / bottom-k) distinct sketch: per
    * group, the k SMALLEST distinct 48-bit value hashes. Unlike HLL
    * (D57) the sketch is a deterministic pure FUNCTION of the value
    * set — no insertion-order sensitivity, bit-identical across
    * engines, so the gate pins the estimate exactly, not a tolerance
    * boolean — and it supports SET OPERATIONS: union = k smallest of
    * the merged sketches, intersection via the Beyer et al. (SIGMOD
    * 2007) ratio estimator. Estimate: exact count below k, else
    * (k-1)·2^48 / h_(k) — pure Long arithmetic.
    *
    * Scale shape: one (group, hash) distinct exchange, then a
    * per-(group, input-slice) pre-prune keeps ≤ k rows per slice
    * BEFORE the per-group rank — the global k-min is necessarily
    * inside some slice's k-min, so no reducer ever sorts a whole
    * group (the deterministicPerGroup two-phase discipline). Output
    * is ≤ k rows per group — the mergeable representation later set
    * operations and appends consume.
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    kmvMerge(df.select(col(groupCol).as("g"), kmvHash(valueCol).as("h")), k)

  /** Bottom-k of already-hashed (g, h) rows — the MERGE operation:
    * because bottom-k of a union is inside the union of bottom-ks,
    * merging per-shard/per-epoch sketch rows through this yields
    * EXACTLY the one-shot corpus sketch (gate-pinned). Same two-phase
    * slice pre-prune as the build.
    */
  def kmvMerge(rows: DataFrame, k: Int): DataFrame = {
    require(k > 1 && k <= 32768, s"k must be in (1, 32768], got $k")
    import org.apache.spark.sql.expressions.Window
    val dh = rows.select(col("g"), col("h")).distinct()
    val pre = dh.withColumn("__slice", spark_partition_id())
      .withColumn("__rs",
        row_number().over(Window.partitionBy("g", "__slice").orderBy("h")))
      .filter(col("__rs") <= k)
      .drop("__rs", "__slice")
    pre.withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("h")))
      .filter(col("rn") <= k)
  }

  /** Persist one shard's bottom-k rows beside the corpus (the D57
    * shard-table discipline with EXACT estimates): k is params-as-law
    * — the first write records it, appends refuse a different k (a
    * mixed-k table would silently under-fill merges). Estimates for
    * any shard subset come from [[kmvEstimateFromShards]] at
    * sketch-table cost, never a corpus rescan.
    */
  // recovery of the flat rows table delegates to the family-shared
  // staged-publish protocol (CellCommit): probes repair only a
  // missing live dir; writers also discard incomplete residue
  private def kmvRecoverForWrite(spark: SparkSession, dir: String): Unit =
    CellCommit.recoverStagedPublish(spark, s"$dir/rows")

  private def kmvRepairForRead(spark: SparkSession, dir: String): Unit =
    CellCommit.repairMissingLive(spark, s"$dir/rows")

  /** Shard-level DELETE from the persisted KMV table: per-shard
    * sketch rows are pure functions of their shard's values, so
    * dropping a shard's rows makes every later merged estimate
    * EXACTLY the sketch of the remaining corpus — no tombstones, no
    * corpus rescan (the property HLL shard tables share and value-
    * level deletes can never have: bottom-k can't subtract a value,
    * but it never needs to subtract a SHARD). Staged survivor rewrite
    * + atomic rename, the family discipline.
    */
  def removeKmvShard(spark: SparkSession, dir: String, shard: String): Unit =
      CellCommit.withMaintenanceLease(spark, dir) {
    kmvRecoverForWrite(spark, dir)
    spark.read.parquet(s"$dir/rows")
      .filter(col("shard") =!= shard)
      .write.mode("errorifexists").parquet(s"$dir/rows__staging")
    CellCommit.publishStaged(spark, s"$dir/rows")
  }

  def writeKmvShard(df: DataFrame, groupCol: String, valueCol: String,
      k: Int, dir: String, shard: String): Unit =
      CellCommit.withMaintenanceLease(df.sparkSession, dir) {
    val spark = df.sparkSession
    // finish a crashed shard delete before appending into live
    kmvRecoverForWrite(spark, dir)
    val paramsPath = new org.apache.hadoop.fs.Path(s"$dir/params")
    val fs = paramsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(paramsPath)) {
      val stored = spark.read.parquet(paramsPath.toString).head().getInt(0)
      require(stored == k,
        s"kmv shard table at $dir was built with k=$stored but this write " +
          s"uses k=$k; delete the table to change k")
    } else {
      spark.range(1).select(lit(k).as("k"))
        .coalesce(1).write.mode("errorifexists").parquet(paramsPath.toString)
    }
    kmvSketch(df, groupCol, valueCol, k)
      .withColumn("shard", lit(shard))
      .write.mode("append").parquet(s"$dir/rows")
  }

  /** Per-group estimate over a shard subset (None = all shards) from
    * the persisted table alone: merge the kept shards' rows, rank,
    * estimate — exact vs the one-shot sketch by the bottom-k-of-union
    * identity.
    */
  def kmvEstimateFromShards(spark: SparkSession, dir: String,
      shards: Option[Seq[String]] = None): DataFrame = {
    kmvRepairForRead(spark, dir)
    val k = spark.read.parquet(s"$dir/params").head().getInt(0)
    val rows = spark.read.parquet(s"$dir/rows")
    val kept = shards match {
      case Some(ss) => rows.filter(col("shard").isin(ss: _*))
      case None => rows
    }
    kmvEstimate(kmvMerge(kept.select("g", "h"), k), k)
  }

  /** Per-group distinct estimate from a [[kmvSketch]] row set:
    * (g, n_sk, kth, kmv_est) — exact when the group has fewer than k
    * distinct values, else the kth-minimum estimator.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy("g")
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("kth"))
      .withColumn("kmv_est",
        when(col("n_sk") < k, col("n_sk"))
          // integer div — Column./ is DOUBLE division and would break
          // bit-parity with the oracle's // on large estimates
          .otherwise(expr(s"${(k - 1L) * KmvRange}L div greatest(kth, 1L)"))
          .cast("long"))

  /** Pairwise set-operation estimates from ONE sketch table: for
    * every group pair (a < b), the union estimate (k smallest of the
    * merged sketches) and the intersection estimate
    * est_inter = n_both · est_union / k, where n_both counts merged
    * k-min hashes present in BOTH input sketches. Below k the merged
    * sketch is the exact union hash set, so both estimates are exact.
    * Cost is |groups|² · k rows — sketch-sized, never corpus-sized.
    */
  // CountSketch hashing: two independent md5-derived streams per
  // (value, row) — one for the bucket, one for the ±1 sign. md5 is the
  // repo's portable hash (SURVEY §6), so grid AND estimates replay
  // bit-for-bit in the DuckDB oracle.
  private def csHash(w: Column, r: Column, salt: String): Column =
    conv(substring(md5(concat(w, lit("#"), r.cast("string"), lit(salt))
      .cast("binary")), 1, 12), 16, 10).cast("long")

  private def csBucket(w: Column, r: Column, width: Int): Column =
    pmod(csHash(w, r, "b"), lit(width.toLong))

  private def csSign(w: Column, r: Column): Column =
    when(pmod(csHash(w, r, "s"), lit(2L)) === 0L, lit(-1L)).otherwise(lit(1L))

  /** D135 — CountSketch (Charikar, Chen & Farach-Colton, ICALP 2002
    * "Finding frequent items in data streams"): a depth×width grid of
    * SIGNED counters — row r adds sign_r(w) to cell (r, bucket_r(w))
    * per occurrence — queried by the exact MEDIAN over rows of
    * sign_r(m)·counter(r, bucket_r(m)). The properties Count-Min
    * (D31) cannot give: the estimate is UNBIASED (collisions cancel
    * in expectation instead of only inflating) and its error scales
    * with the L2 norm of the frequency vector (√(Σf²)/√width), which
    * on a skewed token distribution sits far below CM's L1 bound
    * (N/width) — and the signed grid is the AMS inner-product sketch,
    * so two grids estimate Σ f·g across corpus slices.
    *
    * Everything is integer-exact md5 arithmetic: deterministic
    * buckets and signs, Long counter sums, and an odd-depth exact
    * median — so the gate pins grid and estimates VALUE-exactly
    * against the oracle, not through a tolerance boolean.
    *
    * Scale shape: the (value, r) explode is a projection (no state),
    * the grid aggregate map-side combines each partition to ≤
    * depth·width cells before the only exchange, and estimates join a
    * broadcast marker frame against the kilobyte-sized grid.
    */
  def countSketchGrid(df: DataFrame, valueCol: String,
      width: Int, depth: Int): DataFrame = {
    require(width > 0, s"invalid width $width")
    require(depth > 0 && depth % 2 == 1,
      s"depth must be odd for an exact median, got $depth")
    df.select(col(valueCol).cast("string").as("w"))
      .select(col("w"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), csBucket(col("w"), col("r"), width).as("bucket"),
        csSign(col("w"), col("r")).as("sign"))
      .groupBy("r", "bucket").agg(sum(col("sign")).as("c"))
  }

  /** Median-of-rows CountSketch estimates for every row of a
    * candidate frame (column `token`) against a [[countSketchGrid]].
    * Absent cells count 0 — a candidate whose bucket no value ever
    * touched estimates from zeros. Shared core of the marker-probe
    * ([[countSketchEstimates]]) and vocabulary-scoring
    * ([[countSketchTopK]]) paths.
    */
  private def csMedianEstimates(cands: DataFrame, grid: DataFrame,
      width: Int, depth: Int): DataFrame = {
    val probes = cands
      .select(col("token"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("token"), col("r"),
        csBucket(col("token"), col("r"), width).as("bucket"),
        csSign(col("token"), col("r")).as("sign"))
    // the GRID carries the broadcast hint: Spark cannot broadcast the
    // PRESERVED (left) side of a left outer join, so hinting the
    // probes would be silently ignored and the kilobyte grid could be
    // planned from its pre-AQE corpus-sized input stats
    probes.join(broadcast(grid), Seq("r", "bucket"), "left")
      .select(col("token"), (coalesce(col("c"), lit(0L)) * col("sign")).as("sv"))
      .groupBy("token")
      .agg(element_at(array_sort(collect_list(col("sv"))), (depth + 1) / 2)
        .as("cs_est"))
  }

  /** Median-of-rows CountSketch estimates for a (small) marker set
    * against a [[countSketchGrid]]. Absent cells count 0 — a marker
    * whose bucket no value ever touched estimates from zeros.
    */
  def countSketchEstimates(grid: DataFrame, markers: Seq[String],
      width: Int, depth: Int): DataFrame = {
    require(markers.nonEmpty, "no markers to estimate")
    val spark = grid.sparkSession
    import spark.implicits._
    csMedianEstimates(markers.toDF("token"), grid, width, depth)
  }

  /** Heavy-hitter TOP-K extraction — Charikar et al. 2002's headline
    * use of the sketch (CS + a candidate heap, batched): the distinct-
    * value pass plays the heap's role (each partition's map-side
    * combine reduces its token stream to distinct values before one
    * vocabulary-sized exchange — never more state per partition than
    * its own vocabulary), every candidate is scored by the CS median
    * against the broadcast kilobyte grid, the top k by
    * (estimate DESC, value ASC) survive a TakeOrdered, and the
    * bounded survivor set is EXACTLY verified by one semi-join-
    * filtered corpus recount (the D111 two-pass discipline: only
    * candidate occurrences ever shuffle). Integer md5 arithmetic end
    * to end, so ordering, tie-breaks, estimates AND the exact counts
    * replay value-exactly in a SQL oracle.
    *
    * Returns (token, cs_est, true_count, rank), rank 1..k.
    */
  def countSketchTopK(df: DataFrame, valueCol: String,
      width: Int, depth: Int, k: Int): DataFrame = {
    require(k > 0, s"invalid k $k")
    val toks = df.select(col(valueCol).cast("string").as("token"))
    val grid = countSketchGrid(df, valueCol, width, depth)
    val scored = csMedianEstimates(toks.distinct(), grid, width, depth)
    val order = Seq(col("cs_est").desc, col("token").asc)
    // rank over the k-row TakeOrdered output: the unpartitioned window
    // consumes a limit-bounded subtree (the PlanSpec guardrail shape)
    val cands = scored.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*)))
    val exact = toks
      .join(broadcast(cands.select(col("token"))), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("true_count"))
    cands.join(broadcast(exact), Seq("token"), "left")
      .select(col("token"), col("cs_est"),
        coalesce(col("true_count"), lit(0L)).as("true_count"), col("rank"))
  }

  /** [[countSketchTopK]] from pre-aggregated substrate: an
    * already-merged grid plus a `(token, true_count)` exact-count
    * table — the streaming path's shape, where per-epoch grids merge
    * by cellwise sum (linearity) and per-epoch count partials by
    * plain sum, so the extraction here EQUALS the one-shot batch
    * extraction over the concatenated stream. Same ordering,
    * tie-breaks and output columns as [[countSketchTopK]].
    */
  def countSketchTopKFrom(grid: DataFrame, counts: DataFrame,
      width: Int, depth: Int, k: Int): DataFrame = {
    require(k > 0, s"invalid k $k")
    val scored = csMedianEstimates(counts.select(col("token")), grid, width, depth)
    val order = Seq(col("cs_est").desc, col("token").asc)
    val cands = scored.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*)))
    // the count table is vocabulary-sized: pre-filter it to the k
    // survivors under a broadcast semi-join, then enrich — never
    // broadcast the vocabulary itself
    val candCounts = counts
      .join(broadcast(cands.select(col("token"))), Seq("token"), "left_semi")
    cands.join(broadcast(candCounts), Seq("token"), "left")
      .select(col("token"), col("cs_est"),
        coalesce(col("true_count"), lit(0L)).as("true_count"), col("rank"))
  }

  /** Merge CountSketch grids built with the same (width, depth): the
    * grid is a LINEAR function of the frequency vector, so cellwise
    * sum of counters IS the grid of the concatenated inputs — the
    * property that makes per-shard/per-epoch grids exactly mergeable
    * (the KMV bottom-k-of-union identity's additive twin).
    */
  def countSketchMerge(grids: DataFrame): DataFrame =
    grids.groupBy("r", "bucket").agg(sum(col("c")).as("c"))

  /** AMS inner-product estimate Σ_w f(w)·g(w) from two CountSketch
    * grids of the SAME (width, depth) (Alon, Matias & Szegedy STOC'96
    * §2, the tug-of-war sketch; CountSketch rows are exactly AMS
    * atoms): per row r the bucketwise product Σ_b c_f(r,b)·c_g(r,b)
    * is an unbiased inner-product estimate, and the odd-depth median
    * across rows is the returned value — the cross-corpus overlap
    * statistic (shared-vocabulary mass) neither CM nor KMV can give.
    * Rows with no populated common bucket contribute 0 exactly.
    */
  def countSketchInner(gridA: DataFrame, gridB: DataFrame, depth: Int): DataFrame = {
    require(depth > 0 && depth % 2 == 1,
      s"depth must be odd for an exact median, got $depth")
    val spark = gridA.sparkSession
    val prod = gridA.select(col("r"), col("bucket"), col("c").as("ca"))
      .join(gridB.select(col("r"), col("bucket"), col("c").as("cb")),
        Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("ip"))
    // every row must vote even when the two grids share no populated
    // bucket in it (product 0) — a dropped row would shift the median
    spark.range(depth).select(col("id").cast("int").as("r"))
      .join(prod, Seq("r"), "left")
      .select(coalesce(col("ip"), lit(0L)).as("ip"))
      .agg(element_at(array_sort(collect_list(col("ip"))), (depth + 1) / 2)
        .as("inner_est"))
  }

  def kmvSetEstimates(sketch: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gs = sketch.select("g").distinct()
    val pairs = gs.select(col("g").as("ga"))
      .crossJoin(gs.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    // pair membership exploded to (g, ga, gb) rows so the SKETCH join
    // is an EQUI-join (codegen'd BroadcastHashJoin) — joining sketch
    // rows on g === ga || g === gb planned as BroadcastNestedLoopJoin,
    // bounded here by |groups|²·k but off codegen and quadratic-
    // scanning the sketch if a caller ever passes high-cardinality
    // groups. The one cross product left is the pair GENERATION over
    // the distinct-group dimension, whose output is inherently
    // |groups|² rows; sketch rows never enter a nested loop.
    val members = pairs.select(col("ga"), col("gb"),
      explode(array(col("ga"), col("gb"))).as("g"))
    val merged = sketch.select(col("g"), col("h"))
      .join(broadcast(members), Seq("g"))
      .groupBy("ga", "gb", "h")
      .agg(countDistinct(col("g")).as("n_src"))
    val ranked = merged.withColumn("rn",
        row_number().over(Window.partitionBy("ga", "gb").orderBy("h")))
      .filter(col("rn") <= k)
    ranked.groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_u"), max(col("h")).as("kth"),
        sum(when(col("n_src") === 2, 1L).otherwise(0L)).as("n_both"))
      .withColumn("est_union",
        when(col("n_u") < k, col("n_u"))
          .otherwise(expr(s"${(k - 1L) * KmvRange}L div greatest(kth, 1L)"))
          .cast("long"))
      .withColumn("est_inter",
        when(col("n_u") < k, col("n_both"))
          // algebraically identical to (n_both·est_union) div k but
          // never forms the product: est_union can approach (k−1)·2^48
          // where n_both·est_union wraps silently in Spark's Long while
          // the DuckDB oracle's BIGINT multiply RAISES — a parity
          // divergence on high-cardinality groups. The split keeps
          // every intermediate ≤ est_union + k² in magnitude.
          .otherwise(expr(
            s"(est_union div ${k}L) * n_both + ((est_union % ${k}L) * n_both) div ${k}L"))
          .cast("long"))
      .select("ga", "gb", "n_u", "n_both", "est_union", "est_inter")
  }
}
