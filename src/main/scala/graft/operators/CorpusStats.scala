package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level word statistics — the two-pass shape (corpus
  * aggregate, then join back per document) that distinguishes these
  * from the purely per-row TextFunctions scores. The rarity signal
  * (documents dominated by words few other documents use) is a
  * standard web-corpus quality filter.
  *
  * Scale shape: the exploded (doc, word) stream reduces to DISTINCT
  * words per doc before any exchange; document frequencies come from
  * one hash-aggregate over words; the join back is word-keyed with
  * map-side partial aggregation on the doc side. All outputs are
  * INTEGERS (sum/min of frequencies, distinct counts) so the gate is
  * exact on every engine — ratios are a trivial client-side division.
  */
object CorpusStats {

  /** (word, df) — in how many documents each word appears. */
  def wordDocFrequency(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df"))

  /** D127 — distinctive terms per group (domain-signature extraction:
    * which words mark a source as itself): a term's within-group
    * document-frequency RATE against its corpus rate, as the integer
    * lift lift_ppm = df_grp·N_corpus·10⁶ div (n_grp·df_corpus) —
    * 1,000,000 means "no more common here than anywhere"; top `k`
    * terms per group by (lift desc, term asc). The per-group top-k
    * window runs over VOCABULARY-sized input partitioned by group —
    * never the corpus.
    */
  def distinctiveTerms(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"invalid k $k")
    import org.apache.spark.sql.expressions.Window
    val nAll = docs.count()
    val pairs = docs.select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
      .localCheckpoint() // feeds the group AND corpus df censuses
    val grpDf = pairs.groupBy("grp", "w").agg(count(lit(1)).as("df_g"))
    val corpusDf = pairs.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df_c"))
    val grpN = docs.groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("n_g"))
    val win = Window.partitionBy("grp").orderBy(col("lift_ppm").desc, col("w"))
    grpDf.join(corpusDf, "w").join(broadcast(grpN), "grp")
      .select(col("grp"), col("w"), col("df_g"), col("df_c"),
        expr(s"df_g * ${nAll}L * 1000000L div (n_g * df_c)").as("lift_ppm"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select("grp", "rank", "w", "df_g", "df_c", "lift_ppm")
  }

  /** D125 — vocabulary-pruning APPLY (the LM-preprocessing step
    * behind every fixed-vocab tokenizer: tokens below a document-
    * frequency floor are rewritten to `<unk>` and the corpus
    * reassembled in order). The floor is RELATIVE — keep tokens with
    * df·100 ≥ minDfPct·N — so the same pruning decision replays at
    * any corpus scale. Emits (doc_id, n_tok, n_unk, text_pruned).
    *
    * Scale shape: the df census is one token-keyed map-side-partial
    * aggregate over DISTINCT (doc, token) pairs; the rewrite joins
    * exploded positions against the kept-vocabulary table (broadcast
    * when the head vocabulary is bounded — Spark's planner picks it
    * up from the aggregate's size estimate) and regroups by doc with
    * an order-preserving sort_array — the corpus text shuffles once,
    * as any rewrite must.
    */
  def pruneRareTokens(docs: DataFrame, idCol: String, textCol: String,
      minDfPct: Int): DataFrame = {
    require(minDfPct >= 1 && minDfPct <= 100, s"invalid minDfPct $minDfPct")
    val nDocs = docs.count()
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
      .localCheckpoint() // feeds the df census AND the rewrite join
    val keep = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") * 100 >= lit(minDfPct.toLong) * nDocs)
      .select(col("tok"), lit(true).as("__keep"))
    toks.join(keep, Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("__keep"), col("tok")).otherwise(lit("<unk>")).as("t2"),
        when(col("__keep"), 0L).otherwise(1L).as("unk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("unk").as("n_unk"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("t2")))),
          x => x("t2")), " ").as("text_pruned"))
  }

  /** Per-document rarity profile: distinct word count, summed and
    * minimum document frequency of its words. Low min_df = contains
    * a near-unique word; low sum_df/n_distinct_words = generally
    * rare vocabulary.
    */
  def rarityScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("w"))
    val df = wordDocFrequency(docs, idCol, textCol)
    words.join(df, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct_words"),
        sum("df").as("sum_df"),
        min("df").as("min_df"))
  }

  /** Count-Min frequency sketch over the token stream, queried for a
    * marker set — the heavy-hitter primitive that replaces an exact
    * token groupBy when the vocabulary itself is too big to
    * materialize. Scale shape: Spark's `count_min_sketch` aggregate
    * merges partial sketches ASSOCIATIVELY across partitions, so one
    * pass ships only width·depth counters per partition regardless of
    * corpus size; the driver-side estimate queries touch the merged
    * (kilobyte-sized) sketch only.
    *
    * Per-marker output: the EXACT count (from a cheap filtered
    * aggregate in the same plan — verifiable by any engine) and
    * `estimate_ok`: the CMS guarantee `exact ≤ est ≤ exact + eps·N`
    * holds. The estimate itself is seed-deterministic, so the
    * contract column is stable for a fixed (data, eps, confidence,
    * seed) — the same move as the q_approx_distinct / q_knn_ivf
    * contract gates.
    */
  def heavyHitterCheck(docs: DataFrame, textCol: String, markers: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
    toks.persist() // sketch pass + exact pass + total read the same explode
    try {
      val sketchBytes = toks
        .agg(count_min_sketch(col("w"), lit(eps), lit(confidence), lit(seed)))
        .head().getAs[Array[Byte]](0)
      val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(sketchBytes))
      val total = toks.count()
      val exact = toks.filter(col("w").isin(markers: _*))
        .groupBy("w").agg(count(lit(1)).as("true_count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      markers.sorted.map { m =>
        val t = exact.getOrElse(m, 0L)
        val est = sketch.estimateCount(m)
        (m, t, est >= t && est <= t + (eps * total).toLong)
      }.toDF("token", "true_count", "estimate_ok")
    } finally { toks.unpersist(blocking = false); () }
  }

  /** D111 — two-pass EXACT heavy hitters: every token whose true
    * count clears `minCount`, with its EXACT count — at a cost that
    * never shuffles the vocabulary. Pass 1 reduces the corpus to one
    * driver-resident Count-Min sketch (mergeable partials, the D31
    * machinery); pass 2 streams the corpus again filtering each
    * occurrence against the broadcast sketch (estimate ≥ minCount)
    * and exactly counts only the survivors. CMS can only
    * OVERestimate, so no true heavy hitter is dropped (zero false
    * negatives — the property that makes the result EXACT, not
    * approximate); sketch false positives survive the filter but die
    * at the final exact-count threshold. The result therefore equals
    * plain `GROUP BY token HAVING count ≥ minCount` for ANY sketch
    * parameters — eps only tunes how much false-positive volume the
    * exact pass pays for.
    *
    * Scale shape: two corpus scans (the persisted explode), one
    * aggregate whose state is the fixed width·depth counter grid, and
    * a shuffle of ONLY the candidate occurrences (heavy tokens +
    * bounded false positives) — the full-vocab exchange a naive
    * groupBy would pay never happens. The broadcast-sketch occurrence
    * filter is a mapPartitions (a sketch lookup cannot be a Catalyst
    * expression); it is the established distributed heavy-hitter
    * form.
    */
  def exactHeavyHitters(docs: DataFrame, textCol: String, minCount: Long,
      eps: Double = 0.0001, confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    require(minCount > 0, s"invalid minCount $minCount")
    val spark = docs.sparkSession
    import spark.implicits._
    // two corpus scans by design: the sketch pass materializes now
    // (driver-resident grid), the exact pass is the LAZY frame
    // returned — caching the explode would not survive into the
    // caller's evaluation, and the explode is a cheap projection
    val toks = docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
    val sketchBytes = toks
      .agg(count_min_sketch(col("w"), lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(sketchBytes)
    val survivors = toks.as[String].mapPartitions { it =>
      val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bc.value))
      it.filter(w => sk.estimateCount(w) >= minCount)
    }.toDF("w")
    survivors.groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("w").as("token"), col("n"))
  }

  /** D37 — bigram language-model likelihood scoring: the
    * perplexity-filter shape of CCNet/RefinedWeb-style curation (score
    * each document under an n-gram LM trained on the corpus, filter
    * the tails), made engine-exact. The model is the MLE conditional
    * P(w2|w1) = cb/cu over corpus bigrams; each document scores the
    * integer-scaled sum Σ floor(cb·scale/cu) over its adjacent word
    * pairs — integer `div`, never a float log, so the score is
    * bit-identical on every engine (log-perplexity ranks documents the
    * same way this sum's per-pair monotone transform does for
    * filtering purposes; exactness is what makes it gateable).
    *
    * Scale shape at 100 TB: the (doc, w1, w2) pair stream reduces to
    * the bigram/context count tables BEFORE any join (model rows ≤
    * distinct bigrams, orders below corpus size); the score join is
    * hash-partitioned on the bigram key with map-side partial
    * aggregation of the per-doc sum. cb·scale stays far inside Long:
    * even 10^12 occurrences of one bigram at scale=10^6 is 10^18.
    */
  def bigramLikelihood(docs: DataFrame, idCol: String, textCol: String,
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"invalid scale $scale")
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val pairs = docs
      .select(col(idCol).as("doc_id"), toks.as("t"), size(toks).as("m"))
      .filter(col("m") >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(1), col("m") - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    // context counts roll up from the already-reduced bigram table —
    // NOT a third corpus pass (cu(w1) = Σ cb over w2 by construction)
    val uni = big.groupBy("w1").agg(sum(col("cb")).as("cu"))
    val model = big.join(uni, "w1")
      .select(col("w1"), col("w2"),
        expr(s"cb * $scale div cu").as("lp"))
    pairs.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("score"))
  }

  /** D64 — PMI collocation extraction: adjacent word pairs that
    * co-occur far above chance (pointwise mutual information — the
    * phrase-mining signal tokenizer-vocab and stop-phrase curation
    * steps use). Engine-exact without logs: PMI ≥ log(k/100) iff
    * lift = P(ab)/(P(a)·P(b)) = c(ab)·N / (c_l(a)·c_r(b)) ≥ k/100,
    * tested as the INTEGER product comparison
    * `100·c(ab)·N ≥ k·c_l(a)·c_r(b)`. All probabilities live on the
    * bigram-position space (c_l = left-slot count, c_r = right-slot
    * count, N = bigram positions), so every factor rolls up from the
    * ONE bigram count table — no second corpus pass (the
    * bigramLikelihood context-roll-up trick).
    *
    * Scale shape at 100 TB: one corpus-wide (w1, w2) aggregate, two
    * vocab-sized roll-ups joined back on word keys, N broadcast. The
    * product comparison is done in DECIMAL(38,0) — c(ab)·N exceeds
    * Long past ~10⁹ tokens, and a silent wrap would flip the filter;
    * output columns stay BIGINT counts (the float PMI is a trivial
    * client-side log of reported integers).
    */
  def collocations(docs: DataFrame, textCol: String,
      minPair: Long = 3L, liftC100: Long = 300L): DataFrame = {
    require(minPair >= 1 && liftC100 >= 1, "thresholds must be positive")
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val pairs = docs
      .select(toks.as("t"), size(toks).as("m"))
      .filter(col("m") >= 2)
      .select(explode(transform(sequence(lit(1), col("m") - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val left = big.groupBy("w1").agg(sum("n_pair").as("n_left"))
    val right = big.groupBy("w2").agg(sum("n_pair").as("n_right"))
    val nb = big.agg(sum("n_pair").as("n_bigrams"))
    big.join(left, "w1").join(right, "w2").crossJoin(broadcast(nb))
      .filter(col("n_pair") >= minPair)
      .filter(
        expr("CAST(n_pair * 100 AS DECIMAL(19,0)) * CAST(n_bigrams AS DECIMAL(19,0))") >=
        expr(s"CAST(n_left * $liftC100 AS DECIMAL(19,0)) * CAST(n_right AS DECIMAL(19,0))"))
      .select("w1", "w2", "n_pair", "n_left", "n_right", "n_bigrams")
  }

  /** D51 — per-source dataset card: the one-row-per-source corpus
    * report a pipeline consults before mixing (volume, token budget,
    * exact-dup rate, length profile). Everything is an integer
    * aggregate over one projection — md5 for the dup key, token and
    * char counts — so the card is engine-exact and costs ONE
    * hash-aggregate exchange of fixed-width rows at any corpus size.
    */
  def sourceReport(docs: DataFrame, textCol: String, srcCol: String): DataFrame =
    docs.select(col(srcCol).as("source"),
        md5(col(textCol).cast("binary")).as("__h"),
        size(split(col(textCol), " ")).as("__tok"),
        length(col(textCol)).as("__chars"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__h")).as("n_unique"),
        sum(col("__tok")).as("total_tokens"),
        min(col("__tok")).as("min_tokens"),
        max(col("__tok")).as("max_tokens"),
        sum(col("__chars")).as("total_chars"))
      .withColumn("dup_ppm",
        expr("(n_docs - n_unique) * 1000000 div n_docs"))

  /** D44 — DSIR-shaped importance weighting (Xie et al. 2023): score
    * every document under TWO smoothed bigram models — the target
    * model trained on the seed subset (`seedLabel`) and the raw model
    * trained on the whole corpus — and weight it by the fixed-point
    * log-ratio surrogate `Σ (lp_t − lp_r)` over its bigram
    * occurrences, where `lp = floor(scale·(cb+1)/(cu+V))` is the
    * add-one-smoothed conditional with V = distinct second-word
    * vocabulary. High weight = looks like the seed distribution —
    * the importance-resampling signal for targeted data selection.
    *
    * Scale shape at 100 TB: ONE corpus aggregate builds BOTH models
    * (the seed membership rides as a conditional sum — no second
    * corpus pass, no split-and-union); context totals roll up from
    * the bigram table; V is one broadcast scalar; the score join is
    * hash-partitioned on the bigram key with map-side partials.
    * Integer-exact: (cb+1)·scale stays inside Long to ~9·10^12
    * occurrences of a single bigram.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      seedLabel: org.apache.spark.sql.Column, scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"invalid scale $scale")
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val pairs = docs
      .select(col(idCol).as("doc_id"), seedLabel.cast("boolean").as("__seed"),
        toks.as("t"), size(toks).as("m"))
      .filter(col("m") >= 2)
      .select(col("doc_id"), col("__seed"),
        explode(transform(sequence(lit(1), col("m") - 1),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("__seed"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2")
      .agg(count(lit(1)).as("cb_r"),
        sum(when(col("__seed"), 1L).otherwise(0L)).as("cb_t"))
    val uni = big.groupBy("w1")
      .agg(sum(col("cb_r")).as("cu_r"), sum(col("cb_t")).as("cu_t"))
    val vocab = big.agg(countDistinct(col("w2")).as("v"))
    val model = big.join(uni, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        expr(s"(cb_t + 1) * $scale div (cu_t + v)").as("lp_t"),
        expr(s"(cb_r + 1) * $scale div (cu_r + v)").as("lp_r"))
    pairs.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp_t")).as("score_t"), sum(col("lp_r")).as("score_r"))
      .withColumn("weight", col("score_t") - col("score_r"))
  }

  /** D99 — stupid-backoff trigram scoring (Brants et al. 2007, the
    * LM-scoring scheme built FOR distributed corpora): a trigram
    * model trained on the seed subset scores every document; a
    * trigram unseen in the model backs off to 0.4× its bigram score,
    * and a bigram miss scores 0. Fixed-point integer form: seen
    * trigram → floor(scale·c3/c2ctx); backoff → (2·floor(scale·cb/cu))
    * div 5; miss → 0 — every branch exact on every engine.
    *
    * Scale shape at 100 TB: both models reduce from ONE exploded
    * occurrence stream (seed membership as a conditional-sum filter),
    * context counts roll up from the already-reduced n-gram tables,
    * and scoring is two LEFT hash-joins on fixed-width n-gram keys
    * with map-side partial aggregation of the per-doc sum. Unlike
    * interpolated Kneser-Ney, stupid backoff needs no normalization
    * pass — that is exactly why it was invented for this setting.
    */
  def stupidBackoffScore(docs: DataFrame, idCol: String, textCol: String,
      seedLabel: org.apache.spark.sql.Column, scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"invalid scale $scale")
    val toks = split(coalesce(col(textCol), lit("")), " ")
    val base = docs.select(col(idCol).as("doc_id"),
      seedLabel.cast("boolean").as("__seed"), toks.as("t"), size(toks).as("m"))
    val tri = base.filter(col("m") >= 3)
      .select(col("doc_id"), col("__seed"),
        explode(transform(sequence(lit(1), col("m") - 2),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2"),
            element_at(col("t"), i + 2).as("w3")))).as("p"))
      .select(col("doc_id"), col("__seed"),
        col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
    // seed-trained trigram model; context rolls up from the reduced table
    val c3 = tri.filter(col("__seed")).groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c3"))
    val c2ctx = c3.groupBy("w1", "w2").agg(sum(col("c3")).as("c2"))
    val triModel = c3.join(c2ctx, Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"),
        expr(s"c3 * $scale div c2").as("lp3"))
    // seed-trained bigram model over the SAME occurrence stream's
    // (w2, w3) adjacency — the backoff target P(w3|w2)
    val cb = tri.filter(col("__seed")).groupBy("w2", "w3")
      .agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy("w2").agg(sum(col("cb")).as("cu"))
    val biModel = cb.join(cu, "w2")
      .select(col("w2"), col("w3"), expr(s"(2 * (cb * $scale div cu)) div 5").as("lp2"))
    tri.join(triModel, Seq("w1", "w2", "w3"), "left")
      .join(biModel, Seq("w2", "w3"), "left")
      .select(col("doc_id"),
        coalesce(col("lp3"), col("lp2"), lit(0L)).as("lp"),
        when(col("lp3").isNotNull, 0L).otherwise(
          when(col("lp2").isNotNull, 1L).otherwise(2L)).as("kind"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("kind") === 1L, 1L).otherwise(0L)).as("n_backoff"),
        sum(when(col("kind") === 2L, 1L).otherwise(0L)).as("n_miss"),
        sum(col("lp")).as("score"))
  }

  /** D41 — inter-source overlap audit: for every pair of sources, how
    * many distinct n-gram shingles they share, plus the fixed-point
    * containment `floor(scale·n_shared / min(n_a, n_b))` — the "how
    * much of corpus A is already inside corpus B" number a pipeline
    * checks BEFORE mixing datasets (the cross-dataset analogue of the
    * per-document dedup in D2/D4; reference: dedup family semantics,
    * dedup.rs / analyze-side overlap reports).
    *
    * Scale shape at 100 TB: the token stream reduces to DISTINCT
    * (source, shingle) in one exchange of fixed-width rows, then to
    * per-shingle source SETS in a second — after which ALL pairwise
    * work is bounded by |sources|² per shingle (sources are dozens,
    * not millions; no doc-level self-join ever happens). Per-source
    * shingle totals reuse the same distinct table. Integer-exact:
    * n_shared·scale stays inside Long until ~9·10^12 shared shingles.
    */
  def sourceOverlap(docs: DataFrame, textCol: String, srcCol: String,
      n: Int, scale: Long = 1000000L): DataFrame = {
    require(n >= 1, s"invalid shingle size $n")
    require(scale > 0, s"invalid scale $scale")
    // shingling is CPU-bound; fan a narrow input (one parquet file =
    // one partition) out to the cluster first — a no-op at real scale
    // where the source is already wide (same move as Dedup.shingleTable)
    val base = docs.select(col(srcCol).as("source"), col(textCol).as("__text"))
    val slots = docs.sparkSession.sparkContext.defaultParallelism
    val wide = if (base.rdd.getNumPartitions < slots) base.repartition(slots) else base
    // two-step projection + explode_outer, the Dedup.shingleTable/
    // explodeShingles pattern: a plain explode's implicit non-empty
    // filter is pushed into the scan with the WHOLE shingle expression
    // inlined (split re-evaluated per element_at, interpreted —
    // measured 6.8s vs 0.4s at sf0.1); explode_outer generates no
    // such filter, so the aliased token projection survives
    val sh = wide
      .select(col("source"), TextFunctions.tokens(col("__text")).as("ws"))
      .select(col("source"), TextFunctions.shinglesFromWords(col("ws"), n).as("shs"))
      .select(col("source"), explode_outer(col("shs")).as("shingle"))
      .filter(col("shingle").isNotNull)
      .distinct()
    val perSrc = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val shared = sh.groupBy("shingle")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) > 1)
    val pairs = shared
      .select(explode(col("ss")).as("src_a"), col("ss"))
      .select(col("src_a"), explode(col("ss")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    pairs
      .join(perSrc.select(col("source").as("src_a"), col("n_sh").as("n_a")), "src_a")
      .join(perSrc.select(col("source").as("src_b"), col("n_sh").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"), col("n_b"),
        expr(s"n_shared * $scale div least(n_a, n_b)").as("containment_ppm"))
  }

  /** D56 — token-distribution drift between two corpus slices (new
    * epoch vs old, one source vs the mixture): per-token occurrence
    * rates in ppm on each side and their L1 gap. The mixture-drift
    * monitor a continuously-ingested corpus needs — a domain shift,
    * a scraper regression, or boilerplate flood shows up as a fat
    * drift tail long before it shows in loss curves.
    *
    * Scale shape: ONE corpus aggregate to the vocab-sized
    * (w, cnt_a, cnt_b) table — the side label rides as conditional
    * sums (the D40 trick: no split-and-union, no second pass); side
    * totals are one broadcast row; rates and drift are a pure
    * projection in integer ppm (`div`), so Long holds to ~9·10^12
    * tokens per side and both engines agree bit-for-bit.
    */
  def tokenDrift(docs: DataFrame, textCol: String, sideA: Column,
      minCount: Long = 1L, scale: Long = 1000000L): DataFrame = {
    val tok = docs.select(sideA.as("side"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
    val counts = tok.groupBy("w").agg(
      sum(when(col("side"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(col("side"), 0L).otherwise(1L)).as("cnt_b"))
    val totals = counts.agg(sum("cnt_a").as("ta"), sum("cnt_b").as("tb"))
    counts.filter(col("cnt_a") + col("cnt_b") >= minCount)
      .crossJoin(broadcast(totals))
      .withColumn("rate_a_ppm", expr(s"cnt_a * $scale div ta"))
      .withColumn("rate_b_ppm", expr(s"cnt_b * $scale div tb"))
      .withColumn("drift_ppm", abs(col("rate_a_ppm") - col("rate_b_ppm")))
      .select("w", "cnt_a", "cnt_b", "rate_a_ppm", "rate_b_ppm", "drift_ppm")
  }

  /** D104 — vocabulary-retention audit of a curation pass: what
    * fraction of the corpus's distinct n-gram vocabulary survives
    * into the kept subset — the information-loss number that belongs
    * next to every dedup's byte-savings number (dropping 30% of bytes
    * while keeping 99% of the vocabulary is a win; dropping 30% of
    * the VOCABULARY is a curation bug). One exploded gram pass feeds
    * both distinct counts; the survivor prune is a broadcast-or-hash
    * semi-join on doc ids BEFORE the kept-side distinct, so nothing
    * beyond (gram) keys ever shuffles.
    */
  def vocabRetention(docs: DataFrame, idCol: String, textCol: String,
      survivorIds: DataFrame, n: Int, scale: Long = 1000000L): DataFrame = {
    val g = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.shinglesFromWords(
          TextFunctions.tokens(col(textCol)), n)).as("g"))
    val total = g.agg(countDistinct("g").as("n_total"))
    val kept = g
      .join(survivorIds.select(col(survivorIds.columns.head).as("doc_id")),
        Seq("doc_id"), "left_semi")
      .agg(countDistinct("g").as("n_kept"))
    total.crossJoin(kept)
      .withColumn("retention_ppm", expr(s"n_kept * $scale div n_total"))
      .select("n_total", "n_kept", "retention_ppm")
  }
}
