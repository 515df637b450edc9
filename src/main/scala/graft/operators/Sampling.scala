package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators. Unlike Bernoulli TABLESAMPLE
  * (whose draws are engine- and partitioning-dependent), hash-rank
  * sampling is a pure function of the data: rank rows by a salted
  * content hash and keep the top n per group. Same rows on every
  * engine, every cluster size, every run — which makes samples
  * reproducible AND oracle-checkable, a property training-data
  * pipelines want for eval splits and debugging slices.
  *
  * Scale shape: one shuffle on the group key; the per-group sort is
  * window-local. For n≪group size a pre-filter could bound the sort,
  * but the hash rank is already the cheapest total order available.
  */
object Sampling {

  /** md5 over the concatenated key columns with a seed salt — the
    * portable rank (identical string in DuckDB's md5). Each key is
    * LENGTH-PREFIXED (`len:value`) so adjacent keys can't alias
    * across the separator (("a-b","c") vs ("a","b-c")), and NULL maps
    * to the token `N` — unambiguous, since every non-null token
    * starts with a digit — instead of being silently skipped.
    */
  def hashRank(seed: Long, keys: Column*): Column = {
    val toks = keys.map { k =>
      val s = k.cast("string")
      when(s.isNull, lit("N"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    md5(concat_ws("-", (lit(seed.toString) +: toks): _*).cast("binary"))
  }

  /** 48-bit integer draw from the same portable rank — the keep test
    * `hashMod(seed, keys) % m === 0` is a deterministic 1-in-m sample
    * of whatever the keys identify (rows, pairs, queries), replayable
    * in any engine with md5. 12 hex digits = 48 bits, so the value is
    * always a non-negative Long and the mod is exact integer
    * arithmetic — no float fraction to round differently.
    */
  def hashMod(seed: Long, keys: Column*): Column =
    conv(substring(hashRank(seed, keys: _*), 1, 12), 16, 10).cast("long")

  /** Top-`n` rows per group by salted hash rank. Ties (hash
    * collisions) break on the key columns themselves, so the result
    * is a total function of (seed, data).
    *
    * Two-phase: a one-window-per-(group, input-slice) pre-prune keeps
    * ≤n rows per slice — the global top-n is necessarily inside some
    * slice's top-n, so the survivor set provably contains it — then
    * the true ranks come from a window over the n·slices·groups
    * survivors. A single per-group window would hash EVERYTHING to
    * |groups| reducers and sort whole groups there: with few groups
    * (the gate's 3-flag stratification — or 100 TB split three ways)
    * that is a handful of tasks sorting a third of the corpus each.
    * The slice id is physical-partition-derived, but the OUTPUT is
    * partition-invariant: every slicing's survivor set contains the
    * same global top-n (spec-pinned).
    */
  def deterministicPerGroup(df: DataFrame, groupCols: Seq[String],
      keyCols: Seq[String], n: Int, seed: Long = 42L): DataFrame = {
    val rk = hashRank(seed, keyCols.map(col): _*)
    val order = rk +: keyCols.map(col)
    val slice = Window
      .partitionBy(groupCols.map(col) :+ spark_partition_id().as("__slice"): _*)
      .orderBy(order: _*)
    val survivors = df
      .withColumn("__srk", row_number().over(slice))
      .filter(col("__srk") <= n)
      .drop("__srk")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    survivors.withColumn("sample_rk", row_number().over(w))
      .filter(col("sample_rk") <= n)
  }

  /** Proportional stratified sample: keep `pct` percent of every
    * stratum (floor semantics), deterministically. The keep test is
    * pure INTEGER arithmetic (`rank * 100 <= stratum_count * pct`) —
    * no float fraction whose rounding could differ across engines.
    * One shuffle on the strata key; rank and count share the window
    * partition so the exchange is reused.
    */
  def stratified(df: DataFrame, strataCols: Seq[String], keyCols: Seq[String],
      pct: Int, seed: Long = 42L): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    val part = Window.partitionBy(strataCols.map(col): _*)
    val w = part.orderBy(hashRank(seed, keyCols.map(col): _*) +: keyCols.map(col): _*)
    df.withColumn("sample_rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(part))
      .filter(col("sample_rk").cast("long") * 100 <= col("__n") * pct)
      .drop("__n")
  }

  /** Domain-mixture resampling: per-row copy count from a per-domain
    * epoch target (the up/down-sampling step that reweights corpus
    * sources toward a target training mixture — e.g. 2.0 = every doc
    * twice, 0.5 = a deterministic half, 1.25 = every doc once and a
    * hash-selected quarter twice).
    *
    * Epochs are restricted to quarter-steps so the fractional keep
    * threshold is EXACT in binary — `frac * 2^24` is an integer and
    * the hash-uniform comparison is integer-vs-integer on every
    * engine. The hash uniform comes from the first 6 hex digits of
    * the seeded key hash: deterministic, portable, and independent of
    * partitioning. Zero shuffle — this is a pure projection.
    */
  def domainMix(df: DataFrame, domainCol: String, keyCols: Seq[String],
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    (epochs.values.toSeq :+ defaultEpochs).foreach { e =>
      require(e >= 0 && (e * 4) == math.floor(e * 4),
        s"epochs must be quarter-steps (n/4), got $e")
    }
    val eCol = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (k, v)) =>
      when(col(domainCol) === k, lit(v)).otherwise(acc)
    }
    val u24 = conv(substring(hashRank(seed, keyCols.map(col): _*), 1, 6), 16, 10)
      .cast("long")
    val whole = floor(eCol).cast("long")
    val fracThresh = ((eCol - floor(eCol)) * (1 << 24)).cast("long")
    df.withColumn("n_copies",
      (whole + when(u24 < fracThresh, 1L).otherwise(0L)).cast("int"))
  }

  /** D112 — per-domain top-fraction selection: keep the best
    * `keepPct`% of each domain by a score column — the CCNet-style
    * APPLY step behind every quality/perplexity filter ("keep the top
    * 60% per language bucket"): a single global cut would let one
    * high-scoring domain crowd out every other; the per-domain cut
    * preserves the mixture. Deterministic: rank = ROW_NUMBER over
    * (score desc, id asc) — the id tiebreak makes the kept set a pure
    * function of the data — and the threshold is the integer floor
    * n·keepPct div 100 per domain, so engines cannot disagree at the
    * boundary.
    *
    * Scale shape: one shuffle on the domain key serves both the rank
    * and the per-domain count (same partition spec); a severely
    * skewed domain serializes its own sort only — salt upstream if
    * one domain dominates the corpus.
    */
  def selectTopFraction(df: DataFrame, domainCol: String, scoreCol: String,
      idCol: String, keepPct: Int): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"invalid keepPct $keepPct")
    val byDomain = Window.partitionBy(col(domainCol))
    df.withColumn("__rk", row_number().over(
        byDomain.orderBy(col(scoreCol).desc, col(idCol))))
      .withColumn("__n", count(lit(1)).over(byDomain))
      .filter(expr(s"__rk <= __n * $keepPct div 100"))
      .drop("__rk", "__n")
  }

  /** D110 — token-budget mixture allocator: the planning step BEFORE
    * D22's domainMix can run — given target mixture weights (integer
    * percent) and a total token budget, how many epochs of each
    * source materialize it? Per domain: available tokens, target
    * tokens (budget·w div 100), epochs in hundredths capped at
    * `maxEpochsX100` (repeating a small source too often degrades it
    * — the cap is the over-epoching guard every mixture recipe
    * carries), the tokens the integer plan actually allocates, and
    * the shortfall (cap undershoot + flooring remainder). Feed
    * `epochs_x100` into domainMix's quarter-step schedule (or exact
    * copies via explodeCopies) to execute the plan.
    *
    * Integer-exact throughout: tokens are whitespace-token counts
    * (the D10 contract), all divisions floor, and at 100 TB scale
    * the largest intermediate (target·100) stays well under 2^63.
    * Scale shape: ONE corpus aggregate to the domain-count-sized
    * frame, then pure projection — the budget arithmetic never
    * touches corpus rows. Domains carrying rows but no weight plan
    * at weight 0; weighted domains absent from the corpus emit no
    * row (nothing to allocate from).
    */
  def tokenBudgetAllocation(docs: DataFrame, domainCol: String, textCol: String,
      weightsPct: Map[String, Int], budgetTokens: Long,
      maxEpochsX100: Long = 400L): DataFrame = {
    require(budgetTokens >= 0 && maxEpochsX100 >= 0)
    val wExpr = weightsPct.foldLeft(lit(0)) { case (acc, (d, w)) =>
      when(col("domain") === d, lit(w)).otherwise(acc)
    }
    docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextFunctions.tokens(col(textCol)))).as("n_tokens"))
      .withColumn("weight_pct", wExpr.cast("long"))
      .withColumn("target_tokens", expr(s"${budgetTokens}L * weight_pct div 100"))
      // a weighted domain whose docs are all empty (n_tokens = 0) has
      // nothing to epoch over: plan 0 epochs and report the full
      // target as shortfall — dividing by n_tokens would NULL (or
      // throw under ANSI) instead
      .withColumn("epochs_x100",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(least(expr("target_tokens * 100 div n_tokens"),
            lit(maxEpochsX100))))
      .withColumn("alloc_tokens", expr("epochs_x100 * n_tokens div 100"))
      .withColumn("shortfall_tokens",
        greatest(col("target_tokens") - col("alloc_tokens"), lit(0L)))
      .select("domain", "n_docs", "n_tokens", "weight_pct", "target_tokens",
        "epochs_x100", "alloc_tokens", "shortfall_tokens")
  }

  /** D133 — temperature-scaled mixture weights (the multilingual
    * balancing rule of Conneau & Lample, NeurIPS'19 §3.1, and the
    * mBERT/mT5 exponentiated smoothing): sampling weight ∝ n^(1/T),
    * flattening the head languages and lifting the tail, here at the
    * canonical T = 2 so the exponent is a SQUARE ROOT — the one
    * fractional power both engines compute identically (IEEE-754
    * sqrt is correctly rounded; a general pow is not), making the
    * plan integer-replayable: w = floor(sqrt(n_tokens)) (exact below
    * 2^52 tokens per domain), alloc = budget·w div Σw, and the
    * resulting per-domain epoch factor in integer x100. Unlike D110
    * (caller-supplied weight targets) the mixture here is DERIVED
    * from the corpus itself. One domain-keyed aggregate + a
    * broadcast one-row total — nothing corpus-sized shuffles twice.
    */
  def temperatureMixture(docs: DataFrame, domainCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"invalid budget $budgetTokens")
    val per = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextFunctions.tokens(col(textCol))))
          .cast("long").as("n_tokens"))
      .withColumn("weight", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val total = per.agg(sum("weight").as("__tw"))
    per.crossJoin(broadcast(total))
      .withColumn("alloc_tokens",
        when(col("__tw") === 0L, lit(0L))
          .otherwise(expr(s"${budgetTokens}L * weight div __tw")))
      .withColumn("epochs_x100",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("alloc_tokens * 100 div n_tokens")))
      .select("domain", "n_docs", "n_tokens", "weight", "alloc_tokens",
        "epochs_x100")
  }

  /** Apply step for domainMix: one output row per copy. `sequence(1,
    * 0)` would DESCEND in Spark, so zero-copy rows are guarded to an
    * empty array (plain explode then drops them — the downsampled-out
    * rows).
    */
  /** D81 — deterministic negative sampling for contrastive training:
    * k pseudo-random partner docs per anchor, chosen by
    * hex12(md5("seed:anchor:i")) mod corpus-size over the
    * md5-shuffled position table (Prep.shuffleDeterministic) — so
    * the negative set is a pure function of (corpus, seed) and a
    * re-run on any engine/cluster emits byte-identical training
    * pairs (silently different negatives = silently different
    * contrastive gradients). Rare self-pairs (anchor drawn as its
    * own negative, p = k/n) are kept, not rejected: rejection would
    * make the draw sequence data-dependent and unreplayable — the
    * training loader drops them, the sampler stays pure.
    *
    * Scale shape: one position table build (the two-phase bucket
    * rank), then a pure projection of k draws per anchor equi-joined
    * back on the position — fixed-width rows, no window over the
    * corpus, corpus size ships as a broadcast one-row aggregate, not
    * a driver scalar.
    */
  /** D119 — stratified k-FOLD assignment (cross-validation / balanced
    * eval splits): within each stratum, docs rank by a seeded md5
    * shuffle key (id tiebreak) and fold = (rank−1) mod k — so fold
    * sizes are EXACTLY balanced within every stratum (±1), which the
    * percentage-hash split (`Prep.splitAssign`) cannot guarantee for
    * small strata. Pure function of (data, k, seed): any engine
    * replays the assignment row-exactly.
    *
    * Scale shape: one window PARTITIONED BY stratum (strata are the
    * parallel unit — never a corpus-wide order); skew bound is the
    * largest stratum, the same bound any per-stratum statistic
    * already carries.
    */
  def stratifiedKFold(df: DataFrame, idCol: String, strataCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k >= 2, s"invalid fold count $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(col("__key"), col(idCol))
    df.select(col(idCol), col(strataCol))
      .withColumn("__key", Prep.shuffleKey(col(idCol), seed))
      .withColumn("fold", ((row_number().over(w) - 1) % k).cast("int"))
      .drop("__key")
  }

  def negativeSample(docs: DataFrame, idCol: String, k: Int,
      seed: Long): DataFrame = {
    require(k >= 1, s"invalid k $k")
    val pos = Prep.shuffleDeterministic(docs.select(col(idCol)), idCol, seed)
      .select(col(idCol).as("__nid"), col("pos"))
      .localCheckpoint() // anchors AND the draw target join reuse it
    val n = pos.agg(count(lit(1)).as("__n"))
    val draws = pos.select(col("__nid").as("anchor_id"))
      .crossJoin(broadcast(n))
      .select(col("anchor_id"), col("__n"),
        explode(array((1 to k).map(lit(_)): _*)).as("i"))
      .select(col("anchor_id"), col("i"),
        (conv(substring(md5(concat_ws(":", lit(seed).cast("string"),
            col("anchor_id").cast("string"), col("i").cast("string"))
          .cast("binary")), 1, 12), 16, 10).cast("long") % col("__n") + 1)
          .as("pos"))
    draws.join(pos, "pos")
      .select(col("anchor_id"), col("i"), col("__nid").as("negative_id"))
  }

  def explodeCopies(df: DataFrame, nCopiesCol: String = "n_copies"): DataFrame =
    df.withColumn("copy_idx",
      explode(when(col(nCopiesCol) > 0, sequence(lit(1), col(nCopiesCol)))
        .otherwise(array().cast("array<int>"))))
}
