package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring over a document corpus — the retrieval-side
  * primitive a training-data pipeline uses for query-targeted corpus
  * selection (pull the documents most relevant to a benchmark task or
  * seed set) and for dedup-aware search evaluation.
  *
  * Scale shape: the query term set is tiny by construction, so the
  * (doc, term) stream is filtered BEFORE its aggregation — only
  * matching pairs ever shuffle. Document length is a projection
  * (`size(split)`), not an aggregate; corpus-level scalars (total
  * tokens, doc count, per-term document frequency) reduce to one
  * broadcast-sized row each. One real shuffle: the per-(doc, term)
  * term-frequency aggregate, partial-aggregated map-side. At 100 TB
  * nothing but matched-term pairs and one scalar row moves.
  */
object Relevance {

  /** Real BM25 (k1, b in their standard parameterization):
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). Returns one row per
    * document that matches ≥1 query term: (doc_id, n_matched, score).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol, terms)
    val stats = corpusStats(docs, idCol, textCol)
    val dfPerTerm = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfPerTerm), "w")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("avgdl", col("t_total").cast("double") / col("n_docs"))
      .withColumn("score_t",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"), sum("score_t").as("score"))
  }

  /** The oracle-exact gate surface: the BM25 term-saturation sum in
    * PURE INTEGER arithmetic. With k1 = 6/5 and b = 3/4 the per-term
    * factor tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl)) is rational;
    * multiplying through by 10·T (T = corpus tokens, avgdl = T/N)
    * gives 22·tf·T / (10·T·tf + 3·T + 9·len·N) — so
    * floor(scale · numerator / denominator) is bit-identical on every
    * engine (the idf weight, the only transcendental, is verified
    * separately: df is integer-exact and spec-pinned through bm25).
    * Longs bound the exactness: scale·22·tf·T must stay under 2^63 —
    * holds to ~10^12 corpus tokens at the default scale.
    */
  def bm25SaturationExact(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], scale: Long = 1000000L): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol, terms)
    val stats = corpusStats(docs, idCol, textCol)
    tf.crossJoin(broadcast(stats))
      .withColumn("sat", expr(
        s"($scale * 22 * tf * t_total) DIV (10 * t_total * tf + 3 * t_total + 9 * len * n_docs)"))
      .groupBy("doc_id", "len")
      .agg(count(lit(1)).as("n_matched"), sum("sat").as("sat_score"))
      .select(col("doc_id"), col("len").as("n_tokens"),
        col("n_matched"), col("sat_score"))
  }

  /** (doc_id, len, w, tf) for query-matching terms only — the filter
    * runs before the aggregate, so only matched pairs shuffle.
    */
  private def termFrequencies(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ws"))
      .withColumn("len", size(col("ws")).cast("long"))
      .select(col("doc_id"), col("len"), explode(col("ws")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "len", "w")
      .agg(count(lit(1)).as("tf"))
  }

  /** One broadcast-sized row: (t_total, n_docs). */
  private def corpusStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(size(TextFunctions.tokens(col(textCol))).cast("long").as("l"))
      .agg(sum("l").as("t_total"), count(lit(1)).as("n_docs"))

  /** D100 — reciprocal-rank fusion (Cormack et al., SIGIR'09): merge
    * the ranked lists of heterogeneous retrievers (BM25 text search,
    * vector ANN, …) by summing floor(scale/(k0+rank)) per list —
    * score scales never need calibrating against each other, which is
    * WHY hybrid retrieval ships RRF rather than score mixing. Fixed
    * point (default scale 10^6, k0=60 per the paper) keeps every
    * contribution integral, so an SQL oracle replays the fusion
    * bit-for-bit.
    *
    * Inputs are (idCol, rank) lists — the k-bounded OUTPUT of top-k
    * retrievers, so every frame here is k·|lists|-sized: the outer
    * joins, the fused sum, and the final rank window all run over
    * candidate rows, never a corpus. Ties break to the lowest id.
    *
    * @return (idCol, n_lists, rrf_micro, rank) for rank ≤ topK
    */
  /** D101 — pseudo-relevance-feedback query expansion (the RM3 shape):
    * search once, mine expansion terms from the top `fbDocs` results,
    * search again with the expanded query, and mix. All integer:
    * expansion weight = floor(scale·fb_tf/corpus_tf) (rarity-
    * normalized feedback term frequency — a corpus-common term needs
    * proportionally more feedback mass to qualify, the stopword
    * guard), term selection = top `fbTerms` by (weight DESC, term
    * ASC), final score = 2·orig_sat + exp_sat (original terms keep
    * double weight). Every step replays in SQL.
    *
    * Scale shape: the feedback set is fbDocs rows (driver-collected —
    * bounded by contract, like the ANN query batch); candidate
    * expansion vocabulary is the feedback docs' token set (≤ fbDocs ·
    * max_doc_tokens, broadcast); corpus_tf for candidates only rides
    * a broadcast-filtered token pass; both scoring passes are the
    * D56 BM25 shape (matched-pairs-only shuffles).
    *
    * @return (doc_id, orig_sat, exp_sat, final_sat) for every doc
    *         matching either query; absent-side scores are 0
    */
  def prfExpandedSearch(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], fbDocs: Int, fbTerms: Int,
      scale: Long = 1000000L): DataFrame = {
    require(fbDocs > 0 && fbTerms > 0, "invalid feedback parameters")
    val s0 = bm25SaturationExact(docs, idCol, textCol, terms, scale)
    val fbIds = s0.orderBy(col("sat_score").desc, col("doc_id"))
      .limit(fbDocs).select("doc_id")
      .collect().map(_.getLong(0))
    val fbTok = docs
      .filter(col(idCol).isin(fbIds: _*))
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(!col("w").isin(terms: _*) && col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("fb_tf"))
    val corpusTf = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .join(broadcast(fbTok.select("w")), Seq("w"), "left_semi")
      .groupBy("w").agg(count(lit(1)).as("c_tf"))
    val expTerms = fbTok.join(corpusTf, "w")
      .withColumn("weight", expr(s"fb_tf * $scale div c_tf"))
      .orderBy(col("weight").desc, col("w"))
      .limit(fbTerms)
      .select("w").collect().map(_.getString(0)).toSeq
    val s1 =
      if (expTerms.isEmpty) // degenerate corpus: nothing to expand with
        s0.select(col("doc_id"), lit(0L).as("sat_score")).limit(0)
      else bm25SaturationExact(docs, idCol, textCol, expTerms, scale)
    s0.select(col("doc_id"), col("sat_score").as("orig_sat"))
      .join(s1.select(col("doc_id"), col("sat_score").as("exp_sat")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("orig_sat"), lit(0L)).as("orig_sat"),
        coalesce(col("exp_sat"), lit(0L)).as("exp_sat"))
      .withColumn("final_sat", col("orig_sat") * 2 + col("exp_sat"))
  }

  def rrfFuse(lists: Seq[DataFrame], idCol: String, topK: Int,
      k0: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(topK > 0 && k0 >= 0 && scale > 0, "invalid rrf parameters")
    val contribs = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(idCol),
        expr(s"$scale div ($k0 + rank)").as(s"__c$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val cCols = lists.indices.map(i => col(s"__c$i"))
    val fused = joined.select(col(idCol),
      cCols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _).cast("long").as("n_lists"),
      cCols.map(c => coalesce(c, lit(0L))).reduce(_ + _).as("rrf_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_micro").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** D120 — retrieval-quality metrics IN-ENGINE (the eval harness a
    * search/ANN/curation change is judged by, run where the rankings
    * already live instead of exporting to a notebook): per query,
    * MRR, recall@k, precision@k against a relevance truth set —
    * integer-exact in ppm (reciprocal rank and the ratios are
    * integer divisions), so results replay bit-for-bit across
    * engines and reruns. Recall's denominator is the standard
    * min(k, n_rel) cap. Queries with no relevant candidates are out
    * of scope (metrics undefined) — evaluate over `truth`'s query
    * set.
    *
    * Scale shape: one semi-join of the rank lists (≤ k rows per
    * query) against truth pairs, two query-keyed aggregates —
    * nothing corpus-sized moves.
    *
    * @param ranked (qid, cid, rk) rank lists, rk 1-based (rows past
    *               `k` are ignored)
    * @param truth  (qid, cid) relevance pairs
    */
  def retrievalMetrics(ranked: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"invalid k $k")
    val nRel = truth.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val hits = ranked.filter(col("rk") <= k)
      .join(truth, Seq("qid", "cid"), "left_semi")
      .groupBy("qid")
      .agg(min("rk").as("__first"), count(lit(1)).as("__hits"))
    nRel.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("__hits"), lit(0L)).as("hits_k"),
        coalesce(expr("1000000L div __first"), lit(0L)).as("rr_ppm"),
        expr(s"coalesce(__hits, 0L) * 1000000L div least(CAST($k AS BIGINT), n_rel)")
          .as("recall_ppm"),
        expr(s"coalesce(__hits, 0L) * 1000000L div CAST($k AS BIGINT)").as("prec_ppm"))
  }

  /** D132 — ROUGE-N overlap metrics IN-ENGINE (Lin, ACL'04 — the
    * set-variant: distinct n-gram overlap), for (candidate,
    * reference) doc pairs: recall = |∩|/|ref n-grams|, precision =
    * |∩|/|cand n-grams|, F1 = 2PR/(P+R) — all integer ppm with a
    * zero-denominator guard, the generation-eval counterpart of the
    * D120 retrieval metrics (score a distillation/summary corpus
    * against its references WITHOUT exporting to an eval harness).
    * Scale shape: n-grams reduce to md5 in-projection per side; one
    * join on the pair id, set sizes via array ops — no token ever
    * shuffles raw.
    */
  def rougeN(pairs: DataFrame, candCol: String, refCol: String,
      idCols: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"invalid n $n")
    // callers guard size >= n, so sequence(0, size - n) is ascending
    // and yields every gram start exactly once
    def grams(c: Column): Column = {
      val t = split(coalesce(c, lit("")), " ")
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => md5(concat_ws(" ",
          (1 to n).map(k => element_at(t, i + lit(k))): _*).cast("binary"))))
    }
    pairs
      .withColumn("__cg", when(size(split(coalesce(col(candCol), lit("")), " ")) >= n,
        grams(col(candCol))).otherwise(array().cast("array<string>")))
      .withColumn("__rg", when(size(split(coalesce(col(refCol), lit("")), " ")) >= n,
        grams(col(refCol))).otherwise(array().cast("array<string>")))
      .withColumn("n_cand", size(col("__cg")).cast("long"))
      .withColumn("n_ref", size(col("__rg")).cast("long"))
      .withColumn("n_overlap", size(array_intersect(col("__cg"), col("__rg"))).cast("long"))
      .withColumn("recall_ppm",
        when(col("n_ref") > 0, expr("n_overlap * 1000000L div n_ref")).otherwise(0L))
      .withColumn("prec_ppm",
        when(col("n_cand") > 0, expr("n_overlap * 1000000L div n_cand")).otherwise(0L))
      .withColumn("f1_ppm",
        when(col("recall_ppm") + col("prec_ppm") > 0,
          expr("2 * prec_ppm * recall_ppm div (prec_ppm + recall_ppm)"))
          .otherwise(0L))
      .select((idCols.map(col) ++ Seq(col("n_cand"), col("n_ref"),
        col("n_overlap"), col("recall_ppm"), col("prec_ppm"), col("f1_ppm"))): _*)
  }

  /** D130 — MMR diversified re-ranking (Carbonell & Goldstein,
    * SIGIR'98): from a relevance-ranked candidate pool, greedily pick
    * the item maximizing (100−λ)·rel − λ·max-sim-to-already-selected
    * — the standard redundancy remover between retrieval and a
    * context window (ten near-identical top hits waste the window a
    * plain top-k would fill with them). Exact integers: relevance and
    * similarities are int8-quantized dot products, λ a percentage, so
    * the greedy replays bit-for-bit; ties break (score desc, id asc).
    *
    * Scale shape: the DISTRIBUTED work is the corpus-wide relevance
    * top-`poolK` (one projection + bounded sort); the greedy itself
    * runs on the collected pool — k-bounded driver state, the k-means
    * centroid precedent, and exactly where deployed rerankers run
    * (the pool already fits in one response). Emits one row per
    * selection round: (rank, vec_id, rel, max_sim, score).
    */
  def mmrDiversify(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, poolK: Int, selectK: Int, lambdaPct: Int): DataFrame = {
    require(poolK >= selectK && selectK >= 1, s"invalid poolK=$poolK selectK=$selectK")
    require(lambdaPct >= 0 && lambdaPct <= 100, s"invalid lambdaPct $lambdaPct")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = Prep.quantizeInt8(emb, idCol, vecCol)
      .select(col(idCol).as("vec_id"), col("q"))
    // parameter error, not a bare head-of-empty crash, when the query
    // id is absent — the require-guarded discipline of the family
    val qRow = q.filter(col("vec_id") === queryId).limit(1).collect().headOption
    require(qRow.isDefined, s"queryId $queryId not found in $idCol")
    val qvec = qRow.get.getAs[Seq[Long]]("q").toArray
    val qArr = array(qvec.map(lit(_)): _*)
    val pool = q.filter(col("vec_id") =!= queryId)
      .withColumn("rel",
        aggregate(zip_with(col("q"), qArr, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(poolK)
      .collect().map(r => (r.getLong(0),
        r.getAs[Seq[Long]]("q").toArray, r.getAs[Long]("rel")))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.iterator.map(i => a(i) * b(i)).sum
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Long], Long, Long, Long)] // id, vec, rel, maxSim, score
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    while (selected.size < selectK && remaining.nonEmpty) {
      val scored = remaining.map { case (id, v, rel) =>
        val ms = if (selected.isEmpty) 0L
          else selected.iterator.map(s => dot(v, s._2)).max
        (id, v, rel, ms, (100L - lambdaPct) * rel - lambdaPct * ms)
      }
      val best = scored.minBy { case (id, _, _, _, sc) => (-sc, id) }
      selected += best
      remaining.filterInPlace(_._1 != best._1)
    }
    selected.zipWithIndex
      .map { case ((id, _, rel, ms, sc), i) => (i + 1, id, rel, ms, sc) }
      .toSeq.toDF("rank", "vec_id", "rel", "max_sim", "score")
  }
}
