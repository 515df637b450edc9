package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-preparation operators a training pipeline runs after
  * curation: deterministic corpus shuffling, hash-based split
  * assignment, and context-window chunking. All three are pure
  * functions of (data, seed/params) built on the portable md5 hash, so
  * an SQL oracle replays them row-exactly.
  */
object Prep {

  /** Seeded portable shuffle key: md5("seed:id"). Hex-string ordering
    * IS the shuffle order — both engines sort '0'..'9' < 'a'..'f'.
    */
  def shuffleKey(idCol: Column, seed: Long): Column =
    md5(concat_ws(":", lit(seed), idCol.cast("string")).cast("binary"))

  /** Deterministic global shuffle with MATERIALIZED positions, in the
    * shape that survives 100 TB: a global `row_number() OVER (ORDER BY
    * key)` would funnel every row through ONE window partition, so the
    * position is computed in two phases instead — rank within the
    * key's leading-byte bucket (256-way parallel window), plus the
    * exclusive running total of bucket sizes (a 256-row driver-sized
    * window). Bucket prefix order aligns with full-key order, so
    * offset + rank − 1 equals the global row_number an oracle states
    * directly.
    */
  def shuffleDeterministic(df: DataFrame, idCol: String, seed: Long): DataFrame = {
    val keyed = df.withColumn("shuffle_key", shuffleKey(col(idCol), seed))
      .withColumn("__bucket", substring(col("shuffle_key"), 1, 2))
    val inBucket = Window.partitionBy("__bucket")
      .orderBy("shuffle_key", idCol) // id tiebreak: md5 collisions are
                                     // cryptographically absent, but the
                                     // plan should not RELY on that
    val ranked = keyed.withColumn("__rk", row_number().over(inBucket))
    val offsets = keyed.groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        // unpartitioned by design: input = one row per 2-hex-char key
        // bucket (<=256 rows), pinned by PlanSpec "bounded prefix windows"
        coalesce(sum("__n").over(
          Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__bucket", "__off")
    ranked.join(broadcast(offsets), "__bucket")
      .withColumn("pos", (col("__off") + col("__rk")).cast("long"))
      .drop("__bucket", "__rk", "__off")
  }

  /** D126 — per-group score CALIBRATION by rank normalization: each
    * row's percentile (integer ppm) of its score WITHIN its group —
    * the step that makes quality scores comparable across sources
    * before mixture sampling (a "good" score from a lenient source
    * and a "good" score from a strict one land on the same scale;
    * thresholding raw scores across sources silently skews the mix).
    * Two-phase rank per group — rank within (group, score bucket) +
    * per-group running bucket offsets — so no group ever funnels
    * through a single window partition; the offsets/totals sides are
    * groups × buckets rows, broadcast back.
    */
  def rankCalibrate(df: DataFrame, idCol: String, scoreCol: String,
      groupCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"invalid bucketWidth $bucketWidth")
    val keyed = df.select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        col(scoreCol).cast("long").as("score"))
      .withColumn("__b", expr(s"score div $bucketWidth"))
    val inBucket = Window.partitionBy("grp", "__b").orderBy("score", "doc_id")
    val ranked = keyed.withColumn("__rk", row_number().over(inBucket))
    val counts = keyed.groupBy("grp", "__b").agg(count(lit(1)).as("__n"))
    val offsets = counts
      .withColumn("__off",
        // per-GROUP prefix (partitioned window — input is groups ×
        // buckets rows, the bounded side by construction)
        coalesce(sum("__n").over(Window.partitionBy("grp").orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("grp", "__b", "__off")
    val tot = keyed.groupBy("grp").agg(count(lit(1)).as("n_grp"))
    ranked.join(broadcast(offsets), Seq("grp", "__b"))
      .join(broadcast(tot), Seq("grp"))
      .select(col("doc_id"), col("grp"), col("score"),
        (col("__off") + col("__rk")).as("rank"), col("n_grp"),
        expr("(__off + __rk - 1) * 1000000L div n_grp").as("pct_ppm"))
  }

  /** D128 — deterministic EXACT-k-per-stratum selection (balanced
    * eval-set construction: the same k docs per language/domain every
    * run, regardless of partitioning): rows rank by the seeded
    * portable shuffle key WITHIN their stratum and the first k
    * survive. Built on [[rankCalibrate]]'s two-phase rank (hash-value
    * buckets), so a corpus-sized stratum never funnels through one
    * window partition. Strata smaller than k return whole.
    */
  def stratifiedTopK(df: DataFrame, idCol: String, strataCol: String,
      seed: Long, k: Int): DataFrame = {
    require(k > 0, s"invalid k $k")
    val keyed = df.withColumn("__score",
      conv(substring(shuffleKey(col(idCol), seed), 1, 15), 16, 10).cast("long"))
    rankCalibrate(keyed, idCol, "__score", strataCol, bucketWidth = 1L << 52)
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("grp"), col("rank"))
  }

  /** Hash-based train/val/test assignment: the split is a pure
    * projection on the md5 hex prefix (no shuffle, no state), so the
    * same doc lands in the same split on every engine, every run, at
    * every scale — the property that keeps eval sets uncontaminated
    * when the corpus is rebuilt. Thresholds are hex-string prefixes
    * ('00'..'ff' sort lexicographically), e.g. ("e6", "f3") ≈
    * 90/5/5.
    */
  def splitAssign(df: DataFrame, idCol: String, seed: Long,
      valFrom: String = "e6", testFrom: String = "f3"): DataFrame = {
    require(valFrom < testFrom, s"split thresholds out of order: $valFrom >= $testFrom")
    val b = substring(shuffleKey(col(idCol), seed), 1, 2)
    df.withColumn("split",
      when(b < valFrom, "train").when(b < testFrom, "val").otherwise("test"))
  }

  /** D105 — LEAKAGE-SAFE split assignment: a near-duplicate of a
    * train doc landing in the test set is a memorized answer, not
    * held-out data, so the per-doc hash split (`splitAssign`) silently
    * contaminates eval the moment the corpus contains near-dups — and
    * every web corpus does. Here the unit of assignment is the
    * near-dup CLUSTER: docs cluster over the supplied similarity
    * `pairs` (any pair source composes — exact-hash groups, minhash
    * band survivors, verified-jaccard pairs), the cluster id (min
    * member id, the Components contract) is hashed with the SAME
    * md5-prefix rule as `splitAssign`, and every member inherits its
    * cluster's split — near-dups cannot straddle train/test by
    * construction. A singleton doc's cluster id is its own id, so on
    * a dup-free corpus this IS `splitAssign`, bit for bit. Cost
    * beyond the clustering the dedup pass already ran: one hash
    * projection + one id-keyed join against the two-long-per-doc
    * cluster table.
    */
  def splitAssignClustered(df: DataFrame, idCol: String, pairs: DataFrame,
      seed: Long, valFrom: String = "e6", testFrom: String = "f3"): DataFrame = {
    require(valFrom < testFrom, s"split thresholds out of order: $valFrom >= $testFrom")
    val clusters = Components.clusterDocuments(df.select(col(idCol)), idCol, pairs)
    val b = substring(shuffleKey(col("cluster_id"), seed), 1, 2)
    df.join(clusters, Seq(idCol))
      .withColumn("split",
        when(b < valFrom, "train").when(b < testFrom, "val").otherwise("test"))
  }

  /** Int8 embedding quantization for storage: per-vector max-abs
    * scale, component q = floor(x·127/scale) ∈ [-128, 127] — a 4×
    * footprint cut for ANN corpora whose recall tolerates ~1/254
    * relative rounding (dequant error ≤ scale/127 per component,
    * spec-pinned). Pure projection, no shuffle; every arithmetic step
    * (float→double widening, IEEE multiply/divide, floor) is
    * bit-identical across engines, so quantized values are
    * oracle-replayable. Zero vectors quantize to zeros with scale 0.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    emb.select(col(idCol), v.as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .withColumn("q",
        when(col("scale") === 0d,
          transform(col("v"), _ => lit(0L)))
        .otherwise(
          transform(col("v"), x => floor(x * 127d / col("scale")).cast("long"))))
      .select(col(idCol), col("scale"), col("q"))
  }

  /** Deterministic ±1 sign matrix for signed random projection:
    * sign(j, i) = +1 iff the first hex digit of md5("seed:j:i") is
    * below '8' (top bit of the digest clear). Derived from the same
    * md5 both engines expose, so an SQL oracle RE-DERIVES the matrix
    * from the spec instead of trusting shipped literals.
    */
  def srpSigns(seed: Long, outDim: Int, dim: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, dim) { (j, i) =>
      val d = md.digest(s"$seed:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((d(0) & 0x80) == 0) 1L else -1L
    }
  }

  /** Signed random projection (Charikar hyperplane LSH, integer-exact):
    * project the int8-quantized embedding onto `outDim` ±1 hyperplanes,
    * p_j = Σ_i sign(j,i)·q_i — a 64-float → 16-long reduction whose
    * dot products still track cosine angle, cheap enough to prefilter
    * ANN candidates before touching full vectors. Quantizing FIRST
    * makes every sum exact integer arithmetic, so the result is
    * bit-identical on every engine at every scale. Pure projection:
    * zero shuffle, the sign matrix ships in the plan (outDim·dim
    * literals, driver-sized).
    */
  def projectSigned(emb: DataFrame, idCol: String, vecCol: String,
      outDim: Int, dim: Int, seed: Long): DataFrame = {
    require(outDim > 0 && dim > 0, s"invalid projection ${outDim}x${dim}")
    // ONE codegen'd fused loop for all outDim sums — the declarative
    // per-dim aggregate(zip_with(...)) spelling is an interpreted
    // LambdaFunction fold per dim (non-codegen) and measured ~30×
    // slower on the whole-corpus pass; see functions.SignedProject
    quantizeInt8(emb, idCol, vecCol)
      .select(col(idCol),
        graft.functions.SignedProject
          .signedProject(col("q"), srpSigns(seed, outDim, dim)).as("proj"))
  }

  /** Context-window chunking with overlap: token i of a chunk stream
    * covering [c·stride, c·stride + window) for every start below the
    * token count — the long-document → training-window explode. A pure
    * projection + explode (no shuffle); emitted first/last tokens pin
    * content alignment, not just arithmetic.
    */
  /** D47 — curriculum interleave ordering: rank the corpus by a
    * quality score, cut it into `nTiers` equal rank-tiers, and emit
    * the round-robin `curriculum_key = pos_in_tier·nTiers + tier` —
    * sorted by it, training batches alternate across quality tiers
    * (every batch sees the full quality spectrum) instead of
    * front-loading one tail. All positions derive from the global
    * rank by integer formulas, so an oracle window replays them.
    *
    * Scale shape at 100 TB: the global rank uses the same two-phase
    * decomposition as [[shuffleDeterministic]], but bucketed by the
    * SCORE's value range (`score div bucketWidth` — bucket order
    * aligns with score order, which hash buckets cannot), so the
    * window never funnels the corpus through one partition: rank
    * within bucket (parallel) + exclusive prefix of bucket counts (a
    * driver-sized window). A skewed score distribution skews bucket
    * sizes, not correctness — tune `bucketWidth` to the score range.
    */
  def curriculumOrder(df: DataFrame, idCol: String, scoreCol: String,
      nTiers: Int = 10, bucketWidth: Long = 32): DataFrame = {
    require(nTiers >= 1, s"invalid nTiers $nTiers")
    require(bucketWidth >= 1, s"invalid bucketWidth $bucketWidth")
    val keyed = df.select(col(idCol).as("doc_id"),
        col(scoreCol).cast("long").as("score"))
      .withColumn("__sb", expr(s"score div $bucketWidth"))
    val inBucket = Window.partitionBy("__sb").orderBy("score", "doc_id")
    val ranked = keyed.withColumn("__rk", row_number().over(inBucket))
    val bucketCounts = keyed.groupBy("__sb").agg(count(lit(1)).as("__n"))
    val offsets = bucketCounts
      .withColumn("__off",
        // unpartitioned by design: input = one row per score bucket,
        // pinned by PlanSpec "bounded prefix windows"
        coalesce(sum("__n").over(
          Window.orderBy("__sb").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__sb", "__off")
    val total = bucketCounts.agg(sum("__n").as("__total"))
    ranked.join(broadcast(offsets), "__sb")
      .crossJoin(broadcast(total))
      .withColumn("rank", (col("__off") + col("__rk")).cast("long"))
      .withColumn("tier", expr(s"((rank - 1) * $nTiers) div __total"))
      // tier d spans ranks (ceil(d·N/T), ceil((d+1)·N/T)]; position
      // inside the tier is rank-1 minus the tier's start offset
      .withColumn("pos_in_tier",
        expr(s"rank - 1 - (tier * __total + ${nTiers - 1}) div $nTiers"))
      .withColumn("curriculum_key",
        (col("pos_in_tier") * nTiers + col("tier")).cast("long"))
      .select("doc_id", "score", "rank", "tier", "pos_in_tier", "curriculum_key")
  }

  /** D48 — deterministic weighted Bernoulli downsampling, the APPLY
    * side of importance weighting (D44 scores; this thins): keep each
    * row with probability `weight / max(weight)`, decided by the
    * seeded md5 uniform `u = first-48-bits(md5("seed:id")) mod
    * granularity` against the integer threshold `weight·granularity
    * div maxWeight` — the same hash family as [[shuffleKey]], so the
    * decision is a pure projection any engine replays (and a doc's
    * fate never changes when the corpus around it does, except
    * through maxWeight).
    *
    * Scale shape at 100 TB: one tiny max-aggregate broadcast back;
    * the keep decision is zero-shuffle. weight·granularity stays
    * inside Long for weights up to ~8.8·10^12 at the default 2^20
    * granularity. Weights must be non-negative.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      seed: Long, granularity: Long = 1L << 20): DataFrame = {
    require(granularity > 0, s"invalid granularity $granularity")
    val w = df.select(col(idCol).as("doc_id"),
      col(weightCol).cast("long").as("weight"))
    val maxW = w.agg(max(col("weight")).as("__maxw"))
    w.crossJoin(broadcast(maxW))
      .withColumn("__u",
        conv(substring(shuffleKey(col("doc_id"), seed), 1, 12), 16, 10)
          .cast("long") % granularity)
      .withColumn("threshold", expr(s"(weight * $granularity) div __maxw"))
      .withColumn("kept", col("__u") < col("threshold"))
      .select("doc_id", "weight", "threshold", "kept")
  }

  /** D42 — Z-order (Morton) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Pure integer shift/mask arithmetic — fully
    * codegen'd in Spark and replayable term-for-term in SQL.
    * `bits <= 31` keeps the key inside a signed Long.
    */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _).cast("long")
  }

  /** D42 — Z-order layout audit: assign every row a Morton key over
    * (aCol, bCol) and a fixed-width bin `z >> binShift`, and return
    * per-bin min/max bounds of BOTH source columns — exactly the
    * zone-map a file-skipping reader consults after `OPTIMIZE ZORDER
    * BY`. Locality is the point: with interleaved bits, a range
    * predicate on EITHER column prunes to a bounded set of bins,
    * where a single-column sort gives pruning on one column only.
    *
    * Scale shape at 100 TB: the key is a zero-shuffle projection; the
    * audit is one hash-aggregate on the bin (fixed-width rows, bin
    * cardinality = 2^(2·bits−binShift), sized by the caller to the
    * target file count). The write path is
    * `repartitionByRange(col("zbin"))` + `sortWithinPartitions(zv)` —
    * one range exchange, the same cost as any global sort, after
    * which BOTH dimensions prune at read time.
    */
  def zorderLayout(df: DataFrame, aCol: String, bCol: String,
      bits: Int, binShift: Int): DataFrame = {
    require(binShift >= 0 && binShift < 2 * bits, s"invalid binShift $binShift")
    df.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .select(col("a"), col("b"), zorderKey(col("a"), col("b"), bits).as("zv"))
      .groupBy(shiftright(col("zv"), binShift).as("zbin"))
      .agg(count(lit(1)).as("n"),
        min("a").as("min_a"), max("a").as("max_a"),
        min("b").as("min_b"), max("b").as("max_b"))
  }

  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"invalid chunking ${window}/${stride}")
    val toks = split(col(textCol), " ")
    docs.select(col(idCol), toks.as("__toks"), size(toks).as("__n"))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), ((col("__n") - 1) / stride).cast("int"))))
      .select(
        col(idCol),
        col("pos").as("chunk_idx"),
        (col("pos") * stride).as("start_tok"),
        least(lit(window), col("__n") - col("pos") * stride).as("n_tok"),
        element_at(col("__toks"), col("pos") * stride + 1).as("first_tok"),
        element_at(col("__toks"),
          col("pos") * stride +
            least(lit(window), col("__n") - col("pos") * stride)).as("last_tok"))
  }

  /** D116 — equi-depth quantile bucket assignment (quality deciles,
    * length-tier labels) WITHOUT a corpus-wide window: the naive
    * `ntile(k) OVER (ORDER BY v)` funnels every row through one
    * window partition — the exact anti-pattern shuffleDeterministic
    * exists to avoid — so buckets come from TWO cheap steps instead:
    * (1) one aggregate computes the k−1 `percentile_disc` boundaries
    * (exact, ANSI cume_dist ≥ p semantics both engines share — the
    * q_percentile_disc parity gate pins it), a ONE-ROW frame;
    * (2) a broadcast of that row and a pure projection assigns
    * `bucket = 1 + |{boundaries strictly below v}|` via an in-row
    * array filter. Ties land in the LOWER bucket (v == boundary is
    * not `>`), so assignment is deterministic under any row order.
    * Swap step (1) for approx_percentile (or the D65 persisted
    * sketch) at scales where exact boundaries cost a sort — the
    * assignment projection is unchanged.
    */
  /** D118 — deterministic span-corruption layout for denoising
    * objectives (the T5/BART shape): per document, the token spans a
    * denoising trainer masks out as prediction targets. Candidate
    * span STARTS are a pure seeded md5 draw per token position
    * (hex12 % 100 < ratePct), each start opens a `spanLen`-token
    * span, and overlapping/adjacent spans merge into islands
    * (gaps-and-islands over the per-doc start order) — so the emitted
    * (doc_id, span_idx, start_tok, len) rows are THE corruption
    * layout, replayable bit-for-bit by any engine and any re-run
    * (augmentation that can't be replayed can't be debugged or
    * deduplicated against itself).
    *
    * Scale shape: draw + explode are in-row; the island merge is a
    * window PARTITIONED BY doc (never corpus-wide) over
    * candidate-start rows (≈ ratePct% of tokens). All integer/md5
    * arithmetic.
    */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      ratePct: Int, spanLen: Int, seed: Long): DataFrame = {
    require(ratePct > 0 && ratePct <= 100, s"invalid ratePct $ratePct")
    require(spanLen >= 1, s"invalid spanLen $spanLen")
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val base = docs.select(col(idCol).as("doc_id"), size(toks).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 1)
    val draw = (i: Column) => conv(substring(md5(concat_ws(":",
        lit(seed).cast("string"), col("doc_id").cast("string"), i.cast("string"))
      .cast("binary")), 1, 12), 16, 10).cast("long") % 100
    val cand = base.select(col("doc_id"), col("n_tok"),
        explode(filter(sequence(lit(0L), col("n_tok") - 1),
          i => draw(i) < ratePct)).as("s"))
      .withColumn("e", least(col("s") + spanLen, col("n_tok")))
    val w = Window.partitionBy("doc_id").orderBy("s")
    val isl = cand
      .withColumn("__pmax", max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new", when(col("s") > coalesce(col("__pmax"), lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy("doc_id", "n_tok", "island")
      .agg(min("s").as("start_tok"), (max("e") - min("s")).as("len"))
      .select(col("doc_id"), col("n_tok"), (col("island") - 1).as("span_idx"),
        col("start_tok"), col("len"))
  }

  def quantileBuckets(docs: DataFrame, idCol: String, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"invalid bucket count $nBuckets")
    val bounds = docs.agg(
      array((1 until nBuckets).map { i =>
        expr(s"percentile_disc(${i.toDouble / nBuckets}) WITHIN GROUP (ORDER BY $valueCol)")
      }: _*).as("__bounds"))
    docs.select(col(idCol), col(valueCol))
      .crossJoin(broadcast(bounds))
      .select(col(idCol), col(valueCol),
        (size(filter(col("__bounds"), b => col(valueCol) > b)) + 1)
          .cast("int").as("bucket"))
  }
}
