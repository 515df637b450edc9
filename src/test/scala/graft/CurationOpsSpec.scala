package graft

import graft.operators.{Curate, Decontaminate, Packing, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the corpus-curation operators (SURVEY.md §2.D20–D23):
  * decontamination, stratified sampling, domain-mixture resampling,
  * and sequence packing. Each check includes the partitioning-
  * independence property — results must be a pure function of the
  * data, not of how it happens to be split.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int) = {
    val rng = new scala.util.Random(11L)
    val vocab = (0 until 50).map(i => s"w$i")
    (0 until n).map { i =>
      val words = (0 until 10 + rng.nextInt(20)).map(_ => vocab(rng.nextInt(vocab.length)))
      (i.toLong, words.mkString(" "), if (i % 3 == 0) "en" else "de", s"src${i % 4}")
    }.toDF("doc_id", "text", "lang", "source")
  }

  test("decontaminate: a doc fully overlaps itself; dropContaminated removes exactly the flagged docs") {
    val docs = corpus(60)
    val bench = docs.filter($"doc_id" < 5)
    val self = Decontaminate.overlap(bench, bench, "doc_id", "text", 3)
    // every benchmark doc shares all of its own shingles
    assert(self.count() === 5)
    val flagged = Decontaminate.overlap(docs, bench, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert((0L until 5L).forall(flagged.contains), "bench docs flag against themselves")
    val kept = Decontaminate.dropContaminated(docs, bench, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(flagged).isEmpty)
    assert(kept.size === 60 - flagged.size)
  }

  test("decontaminate: zero overlap when vocabularies are disjoint") {
    val train = Seq((1L, "a b c d e"), (2L, "c d e f g")).toDF("doc_id", "text")
    val bench = Seq((9L, "x y z x y z")).toDF("doc_id", "text")
    assert(Decontaminate.overlap(train, bench, "doc_id", "text", 3).count() === 0)
  }

  test("splitContamination: hand-worked overlap counts, zero path kept, partition-invariant") {
    // train doc 1 holds the shingles of "a b c d e"; test doc 2 is a
    // full near-dup (leak_ppm 1000000), test doc 3 shares exactly one
    // 3-gram ("c d e": 3 of its 4 shingles are novel), test doc 4 is
    // disjoint (kept with zero overlap — the audit reports the
    // distribution, not a blacklist)
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "c d e p q r"), (4L, "x y z w v")).toDF("doc_id", "text")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "test"), (4L, "val"))
      .toDF("doc_id", "split")
    val got = Decontaminate.splitContamination(docs, splits, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(2L) === (("test", 3L, 3L, 1000000L)))
    assert(got(3L) === (("test", 4L, 1L, 250000L)))
    assert(got(4L) === (("val", 3L, 0L, 0L)))
    assert(!got.contains(1L), "train docs are not audited rows")
    val again = Decontaminate.splitContamination(
        docs.repartition(5), splits.repartition(3), "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(again === got)
  }

  test("electSurvivorsByQuality: best member wins, id breaks ties, singletons elect themselves") {
    // cluster {1,2}: doc 2 is all-stopword (higher quality score) and
    // must beat the lower id; cluster {3,4}: identical texts tie on
    // score, so the LOWER id wins; doc 5 is a singleton
    val docs = Seq(
      (1L, "xxx yyy zzz qqq www eee rrr ttt uuu iii"),
      (2L, "the a of and to in the a of and"),
      (3L, "same text here same text here same text here one"),
      (4L, "same text here same text here same text here one"),
      (5L, "lonely doc with no pair at all here now ok")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("d1", "d2")
    val got = Curate.electSurvivorsByQuality(docs, "doc_id", "text", pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 2L)), "quality must beat the min id")
    assert(got(3L) === ((3L, 2L)), "score tie breaks to the lower id")
    assert(got(5L) === ((5L, 1L)))
    val again = Curate.electSurvivorsByQuality(
        docs.repartition(4), "doc_id", "text", pairs.repartition(2))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(again === got)
  }

  test("stratified: per-stratum counts are floor(pct*n/100), any partitioning") {
    val docs = corpus(101) // strata of 26/25/25/25
    for (parts <- Seq(1, 7)) {
      val got = Sampling.stratified(docs.repartition(parts),
        Seq("source"), Seq("doc_id"), pct = 20)
      val bySrc = got.groupBy("source").count().as[(String, Long)].collect().toMap
      assert(bySrc("src0") === 5) // floor(26*20/100)
      assert(bySrc("src1") === 5)
    }
    // determinism: same rows regardless of partitioning
    val a = Sampling.stratified(docs.repartition(3), Seq("source"), Seq("doc_id"), 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratified(docs.coalesce(1), Seq("source"), Seq("doc_id"), 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("stratified: pct=100 keeps everything, pct=0 keeps nothing") {
    val docs = corpus(40)
    assert(Sampling.stratified(docs, Seq("source"), Seq("doc_id"), 100).count() === 40)
    assert(Sampling.stratified(docs, Seq("source"), Seq("doc_id"), 0).count() === 0)
  }

  test("domainMix: whole epochs are exact, fractional epochs bounded, explode matches") {
    val docs = corpus(200)
    val mixed = Sampling.domainMix(docs, "lang", Seq("doc_id"),
      epochs = Map("en" -> 2.0), defaultEpochs = 0.5)
    val en = mixed.filter($"lang" === "en")
    assert(en.filter($"n_copies" =!= 2).count() === 0, "whole epochs: exactly 2 copies")
    val de = mixed.filter($"lang" =!= "en")
    assert(de.filter($"n_copies" > 1).count() === 0, "0.5 epochs: 0 or 1 copies")
    val deKept = de.filter($"n_copies" === 1).count().toDouble / de.count()
    assert(deKept > 0.3 && deKept < 0.7, s"~half kept at 0.5 epochs, got $deKept")
    // explodeCopies emits exactly sum(n_copies) rows and drops zeros
    val total = mixed.agg(sum("n_copies")).as[Long].head()
    assert(Sampling.explodeCopies(mixed).count() === total)
  }

  test("domainMix: deterministic across partitionings; rejects non-quarter epochs") {
    val docs = corpus(80)
    val a = Sampling.domainMix(docs.repartition(5), "lang", Seq("doc_id"), Map("en" -> 1.25))
      .select("doc_id", "n_copies").as[(Long, Int)].collect().sorted.toSeq
    val b = Sampling.domainMix(docs.coalesce(1), "lang", Seq("doc_id"), Map("en" -> 1.25))
      .select("doc_id", "n_copies").as[(Long, Int)].collect().sorted.toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      Sampling.domainMix(docs, "lang", Seq("doc_id"), Map("en" -> 1.1))
    }
  }

  test("tokenBudgetAllocation: hand-worked plan across all three regimes, partition-invariant") {
    // domain a: 2 docs × 3 tokens = 6; b: 1 doc × 4; c: 1 doc × 10.
    // budget 30, weights a=50 b=30 c=10 (unweighted d -> 0), cap 2.0:
    //   a: target 15, raw epochs 15*100 div 6 = 250 -> CAPPED 200,
    //      alloc 200*6 div 100 = 12, shortfall 3
    //   b: target 9, epochs 900 div 4 = 225 -> capped 200, alloc 8, short 1
    //   c: target 3, epochs 300 div 10 = 30 (sub-epoch), alloc 3, short 0
    //   d: weight 0 -> all zeros
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "p q r"),
      (3L, "b", "w x y z"), (4L, "c", "a b c d e f g h i j"),
      (5L, "d", "lone row"))
      .toDF("doc_id", "domain", "text")
    val got = Sampling.tokenBudgetAllocation(docs, "domain", "text",
        Map("a" -> 50, "b" -> 30, "c" -> 10), budgetTokens = 30L,
        maxEpochsX100 = 200L)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq === Seq(
      ("a", 2L, 6L, 50L, 15L, 200L, 12L, 3L),
      ("b", 1L, 4L, 30L, 9L, 200L, 8L, 1L),
      ("c", 1L, 10L, 10L, 3L, 30L, 3L, 0L),
      ("d", 1L, 2L, 0L, 0L, 0L, 0L, 0L)))
    val again = Sampling.tokenBudgetAllocation(docs.repartition(4), "domain",
        "text", Map("a" -> 50, "b" -> 30, "c" -> 10), 30L, 200L)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(again.toSeq === got.toSeq)
  }

  test("selectTopFraction: per-domain floor cut, id tiebreak, partition-invariant") {
    // domain a: 5 rows, 60% -> floor(3); scores force a tie at the
    // boundary: ids 1..5 with scores 9,7,7,7,2 -> kept 1,2,3 (7-tie
    // broken by smaller id). domain b: 2 rows, 60% -> floor(1.2) = 1.
    // domain c: 1 row, 60% -> floor(0.6) = 0 kept (small buckets die
    // at low keepPct — deterministic, documented).
    val df = Seq(
      (1L, "a", 9L), (2L, "a", 7L), (3L, "a", 7L), (4L, "a", 7L), (5L, "a", 2L),
      (6L, "b", 5L), (7L, "b", 5L),
      (8L, "c", 100L)).toDF("doc_id", "dom", "score")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.selectTopFraction(d, "dom", "score", "doc_id", keepPct = 60)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(run(df) === Seq(1L, 2L, 3L, 6L))
    assert(run(df.repartition(5)) === Seq(1L, 2L, 3L, 6L))
    // keepPct 100 keeps everything, 0 keeps nothing
    assert(Sampling.selectTopFraction(df, "dom", "score", "doc_id", 100).count() === 8)
    assert(Sampling.selectTopFraction(df, "dom", "score", "doc_id", 0).count() === 0)
  }

  test("rarity: df bounds hold; unique words give min_df = 1") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (1L, "common common unique1"), (2L, "common x"), (3L, "common x y"))
      .toDF("doc_id", "text")
    val r = CorpusStats.rarityScores(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // doc 1: words {common(df3), unique1(df1)} -> n=2, sum=4, min=1
    assert(r(1L) === ((2L, 4L, 1L)))
    // doc 2: {common(3), x(2)} -> n=2, sum=5, min=2
    assert(r(2L) === ((2L, 5L, 2L)))
    // doc 3: {common(3), x(2), y(1)} -> n=3, sum=6, min=1
    assert(r(3L) === ((3L, 6L, 1L)))
  }

  test("bigram LM: hand-verified integer scores, short docs excluded, partition-invariant") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (0L, "a b a b"), (1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    // pairs: d0 (a,b),(b,a),(a,b); d1 (a,b),(b,c)
    // cb: (a,b)=3 (b,a)=1 (b,c)=1; cu: a=3, b=2
    // lp: (a,b)=1000000, (b,a)=500000, (b,c)=500000
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.bigramLikelihood(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = run(docs)
    assert(got(0L) === ((3L, 2500000L)))
    assert(got(1L) === ((2L, 1500000L)))
    assert(!got.contains(2L)) // one-word doc has no bigrams
    assert(run(docs.repartition(5)) === got)
    // plan: UDF-free, partial aggregation on every reduce, no cartesian
    val plan = CorpusStats.bigramLikelihood(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("CartesianProduct"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("stupid backoff: seen/backoff/miss branches hand-verified, partition-invariant") {
    import graft.operators.CorpusStats
    // seed doc 0: "a b c a b d" -> seed trigrams (a,b,c),(b,c,a),(c,a,b),(a,b,d)
    //   c3: each = 1; c2 contexts: (a,b)=2, (b,c)=1, (c,a)=1
    //   lp3: (a,b,c) = 1e6 div 2 = 500000; (b,c,a)=1e6; (c,a,b)=1e6; (a,b,d)=500000
    //   cb (w2,w3): (b,c)=1,(c,a)=2,(a,b)=1,(b,d)=1; cu: b=2, c=2, a=1
    // non-seed doc 1: "a b c x y" -> trigrams (a,b,c) seen lp3=500000;
    //   (b,c,x): tri miss, bigram (c,x) miss -> 0, kind=2
    //   (c,x,y): tri miss, bigram (x,y) miss -> 0, kind=2
    // non-seed doc 2: "x b c a" -> (x,b,c): tri miss, bigram (b,c): cb=1 cu=2
    //   -> lp2 = (2*(1e6 div 2)) div 5 = 200000, kind=1
    //   (b,c,a): seen -> 1e6
    val docs = Seq((0L, true, "a b c a b d"), (1L, false, "a b c x y"),
      (2L, false, "x b c a")).toDF("doc_id", "seed", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.stupidBackoffScore(df, "doc_id", "text", col("seed"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = run(docs)
    assert(got(0L) === ((4L, 0L, 0L, 3000000L)))
    assert(got(1L) === ((3L, 0L, 2L, 500000L)))
    assert(got(2L) === ((2L, 1L, 0L, 1200000L)))
    assert(run(docs.repartition(5)) === got)
    val plan = CorpusStats.stupidBackoffScore(docs, "doc_id", "text", col("seed"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("CartesianProduct"), plan)
  }

  test("collocations: hand-verified lift boundary, thresholds, partition-invariant") {
    import graft.operators.CorpusStats
    val docs = Seq((0L, "x y x y"), (1L, "x y z"), (2L, "p q"))
      .toDF("doc_id", "text")
    // big: (x,y)=3 (y,x)=1 (y,z)=1 (p,q)=1, N=6
    // lift·100: (x,y)=200, (y,x)=300, (y,z)=300, (p,q)=600
    def run(df: org.apache.spark.sql.DataFrame, minPair: Long, lift: Long) =
      CorpusStats.collocations(df, "text", minPair, lift)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // >= is inclusive: the two exactly-at-300 pairs survive
    assert(run(docs, 1L, 300L) === Set(("y", "x", 1L), ("y", "z", 1L), ("p", "q", 1L)))
    assert(run(docs, 1L, 301L) === Set(("p", "q", 1L)))
    assert(run(docs, 2L, 300L) === Set.empty)
    assert(run(docs.repartition(4), 1L, 300L) === run(docs, 1L, 300L))
    val plan = CorpusStats.collocations(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("CartesianProduct"), plan)
  }

  test("importance weights: hand-verified two-model scores, partition-invariant") {
    import graft.operators.CorpusStats
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "a b a b", true), (1L, "a b c", false), (2L, "solo", false))
      .toDF("doc_id", "text", "seed")
    // big: (a,b) cb_r=3 cb_t=2; (b,a) 1/1; (b,c) 1/0
    // uni: a cu_r=3 cu_t=2; b cu_r=2 cu_t=1;  V = |{b,a,c}| = 3
    // lp_t: (a,b)=floor(3e6/5)=600000 (b,a)=floor(2e6/4)=500000 (b,c)=floor(1e6/4)=250000
    // lp_r: (a,b)=floor(4e6/6)=666666 (b,a)=floor(2e6/5)=400000 (b,c)=400000
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.importanceWeights(df, "doc_id", "text", col("seed"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = run(docs)
    assert(got(0L) === ((3L, 1700000L, 1733332L, -33332L)))
    assert(got(1L) === ((2L, 850000L, 1066666L, -216666L)))
    assert(!got.contains(2L))
    assert(run(docs.repartition(5)) === got)
    val plan = CorpusStats.importanceWeights(docs, "doc_id", "text", col("seed"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("CartesianProduct"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("source report: hand-computed card, dup rate, partition-invariant") {
    import graft.operators.CorpusStats
    val docs = Seq(
      (0L, "a b c", "A"), (1L, "a b c", "A"), (2L, "d e", "A"),
      (3L, "x", "B")).toDF("doc_id", "text", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.sourceReport(df, "text", "source")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5),
            r.getLong(6), r.getLong(7)))).toMap
    val got = run(docs)
    // A: 3 docs, 2 unique, 8 tokens, min 2 max 3, 13 chars, dup 1/3
    assert(got("A") === ((3L, 2L, 8L, 2, 3, 13L, 333333L)))
    assert(got("B") === ((1L, 1L, 1L, 1, 1, 1L, 0L)))
    assert(run(docs.repartition(5)) === got)
  }

  test("packing: offsets are contiguous per shard, bins cover all tokens, any partitioning") {
    val docs = corpus(120)
    for (parts <- Seq(1, 6)) {
      val packed = Packing.packDocs(docs.repartition(parts), "doc_id", "text",
        ctxLen = 64, shards = 4)
      val rows = packed.select("shard", "doc_id", "n_tokens", "start_off", "end_off")
        .as[(Int, Long, Int, Long, Long)].collect()
      rows.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._2)
        var expect = 0L
        sorted.foreach { case (_, id, n, start, end) =>
          assert(start === expect, s"doc $id starts at $start, expected $expect")
          assert(end === start + n)
          expect = end
        }
      }
    }
    val bins = Packing.packBins(docs, "doc_id", "text", 64, 4)
    val totalFromBins = bins.agg(sum("bin_tokens")).as[Long].head()
    val totalTokens = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    assert(totalFromBins === totalTokens, "no tokens lost or double-counted")
    // bin ids are the start-offset chunks: within a shard they are non-decreasing
    // and bounded by total/ctx
    val maxBin = bins.agg(max("bin")).as[Long].head()
    assert(maxBin <= totalTokens / 64 + 1)
  }

  test("token drift: hand-verified ppm rates and L1 gap, partition-invariant") {
    // side A (doc 0): "a a b" -> TA=3; side B (doc 1): "a c" -> TB=2
    val rows = Seq((0L, "a a b"), (1L, "a c"))
    val expected = Set(
      ("a", 2L, 1L, 666666L, 500000L, 166666L),
      ("b", 1L, 0L, 333333L, 0L, 333333L),
      ("c", 0L, 1L, 0L, 500000L, 500000L))
    for (parts <- Seq(1, 4)) {
      val got = graft.operators.CorpusStats.tokenDrift(
          rows.toDF("doc_id", "text").repartition(parts),
          "text", col("doc_id") % 2 === 0)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(got === expected, s"parts=$parts")
    }
    // minCount prunes the report, not the totals the rates divide by
    val pruned = graft.operators.CorpusStats.tokenDrift(
        rows.toDF("doc_id", "text"), "text", col("doc_id") % 2 === 0,
        minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(pruned === Set("a" -> 666666L))
  }
}
