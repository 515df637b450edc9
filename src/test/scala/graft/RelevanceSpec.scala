package graft

import graft.operators.Relevance
import org.scalatest.funsuite.AnyFunSuite

/** D27 BM25: the double-path score against the textbook formula on a
  * hand-computed corpus, and the integer saturation surface against
  * its closed form.
  */
class RelevanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus: T = 10 tokens, N = 3 docs, avgdl = 10/3
  private lazy val docs = Seq(
    (1L, "join scan join"),        // len 3: tf(join)=2, tf(scan)=1
    (2L, "sort merge sort merge"), // len 4: no query terms
    (3L, "join x y"))              // len 3: tf(join)=1
    .toDF("doc_id", "text")

  test("bm25 matches the textbook formula (k1=1.2, b=0.75)") {
    val out = Relevance.bm25(docs, "doc_id", "text", Seq("join", "scan"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_matched"), r.getAs[Double]("score")))).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L)._1 === 2L)
    assert(out(3L)._1 === 1L)

    val n = 3.0
    val avgdl = 10.0 / 3.0
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def sat(tf: Double, len: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))
    val d1 = idf(2) * sat(2, 3) + idf(1) * sat(1, 3) // join df=2, scan df=1
    val d3 = idf(2) * sat(1, 3)
    assert(math.abs(out(1L)._2 - d1) < 1e-12, s"${out(1L)._2} vs $d1")
    assert(math.abs(out(3L)._2 - d3) < 1e-12)
    assert(out(1L)._2 > out(3L)._2, "two matched terms must outrank one")
  }

  test("bm25SaturationExact matches its closed integer form") {
    val out = Relevance.bm25SaturationExact(docs, "doc_id", "text",
      Seq("join", "scan")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_matched"),
          r.getAs[Long]("sat_score")))).toMap
    // floor(1e6 * 22*tf*T / (10*T*tf + 3*T + 9*len*N)), T=10, N=3
    def sat(tf: Long, len: Long) =
      (1000000L * 22 * tf * 10) / (10L * 10 * tf + 3 * 10 + 9 * len * 3)
    assert(out(1L) === ((3L, 2L, sat(2, 3) + sat(1, 3))))
    assert(out(3L) === ((3L, 1L, sat(1, 3))))
  }

  test("unmatched documents are absent, empty query rejected") {
    val out = Relevance.bm25(docs, "doc_id", "text", Seq("nosuchterm")).collect()
    assert(out.isEmpty)
    intercept[IllegalArgumentException] {
      Relevance.bm25(docs, "doc_id", "text", Nil)
    }
  }

  test("prfExpandedSearch: expansion terms come from feedback docs, rarity-weighted, final mix exact") {
    import spark.implicits._
    // query 'q'. doc 1 matches and is the only feedback doc; its other
    // terms: 'rare' (corpus_tf 1 -> weight 1e6) and 'common' (corpus_tf
    // 3 -> weight 333333). fbTerms=1 must pick 'rare' and NOT 'common';
    // doc 2 contains 'rare' so it gains exp_sat while doc 3 ('common'
    // only) must stay absent.
    val docs = Seq((1L, "q rare common"), (2L, "rare x y"), (3L, "common z w"),
      (4L, "common u v")).toDF("doc_id", "text")
    val got = Relevance.prfExpandedSearch(docs, "doc_id", "text", Seq("q"),
        fbDocs = 1, fbTerms = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // T=12 tokens, N=4 docs, len=3 everywhere, tf=1:
    // sat = floor(1e6*22*12 / (120 + 36 + 9*3*4)) = floor(264e6/264) = 1000000
    val unit = 1000000L * 22 * 12 / (10L * 12 + 3 * 12 + 9 * 3 * 4)
    assert(got(1L) === ((unit, unit, 3 * unit))) // matches 'q' AND its own 'rare'
    assert(got(2L) === ((0L, unit, unit)))       // expansion-only match
    assert(!got.contains(3L) && !got.contains(4L), "common must not be selected")
  }

  test("rrfFuse: hand-worked fusion, single-list docs, tie to lowest id, topK bound") {
    import spark.implicits._
    // list A ranks docs 1,2,3; list B ranks 2,3,4.
    // contributions (scale 1e6, k0 60): r1=16393, r2=16129, r3=15873
    // doc2: 16129+16393=32522; doc3: 15873+16129=32002;
    // doc1: 16393 (A only); doc4: 15873 (B only)
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("doc_id", "rank")
    val got = Relevance.rrfFuse(Seq(a, b), "doc_id", topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq === Seq((2L, 2L, 32522L, 1), (3L, 2L, 32002L, 2),
      (1L, 1L, 16393L, 3)), got.toSeq.toString)
    // equal ranks in disjoint lists -> equal scores -> lowest id first
    val c = Seq((9L, 1)).toDF("doc_id", "rank")
    val d = Seq((5L, 1)).toDF("doc_id", "rank")
    val tie = Relevance.rrfFuse(Seq(c, d), "doc_id", topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(tie.toSeq === Seq((5L, 1), (9L, 2)))
  }
}
