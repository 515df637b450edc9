package graft

import graft.operators.CorpusStats
import org.scalatest.funsuite.AnyFunSuite

/** D31 Count-Min heavy hitters: exact counts, the CMS bound contract,
  * absent markers, and stability at every local SF (the gate's
  * estimate_ok column must be deterministically TRUE for the shipped
  * (eps, confidence, seed)).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact counts, bound contract, and absent markers on a hand corpus") {
    val docs = Seq(
      (1L, "a b a c"), (2L, "a b"), (3L, "zzz a")).toDF("doc_id", "text")
    val got = CorpusStats.heavyHitterCheck(docs, "text",
        markers = Seq("a", "b", "missing"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("a") === ((4L, true)))
    assert(got("b") === ((2L, true)))
    assert(got("missing") === ((0L, true)), "absent marker reports 0 and holds the bound")
    // output is sorted by token (gate determinism)
    val order = CorpusStats.heavyHitterCheck(docs, "text", Seq("b", "a"))
      .collect().map(_.getString(0)).toSeq
    assert(order === Seq("a", "b"))
  }

  test("D111 exactHeavyHitters == plain groupBy-having, any sketch params, any partitioning") {
    val docs = (1 to 60).map { i =>
      // 'hot' in every doc (60), 'warm' in half (30), 'w<i>' unique
      (i.toLong, s"hot ${if (i % 2 == 0) "warm" else s"u$i"} w$i")
    }.toDF("doc_id", "text")
    val expect = Map("hot" -> 60L, "warm" -> 30L)
    def run(eps: Double, parts: Int) =
      CorpusStats.exactHeavyHitters(docs.repartition(parts), "text",
          minCount = 30L, eps = eps)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(0.0001, 1) === expect)
    // a DELIBERATELY coarse sketch (heavy collisions -> many false
    // positives) must still return the exact answer: the false
    // positives die at the exact-count threshold
    assert(run(0.4, 7) === expect)
    // threshold boundary: minCount = 31 excludes 'warm' exactly
    val tight = CorpusStats.exactHeavyHitters(docs, "text", minCount = 31L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight === Map("hot" -> 60L))
  }

  test("hll: merged per-shard sketches estimate inside the bound") {
    import graft.operators.Sketches
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select((col("doc_id") % 8).as("shard"),
        md5(col("text").cast("binary")).as("h"))
    // NOTE: the union path may land in a different DataSketches mode
    // (sparse vs dense) than a one-shot sketch, so merged estimates
    // are compared to the EXACT count, not to the one-shot estimate
    val exact = docs.agg(countDistinct(col("h"))).head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_spec").toString
    Sketches.writeCardinalitySketches(docs, "h", "shard", s"$dir/sk")
    val merged = Sketches.estimateDistinct(spark, s"$dir/sk")
    assert(math.abs(merged - exact) * 100 <= exact * 5,
      s"union estimate $merged vs exact $exact")
    // sketch BYTES are insertion-order-sensitive (DataSketches sparse
    // internals), so across partitionings the guarantee is the error
    // bound, not byte equality
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hll_spec2").toString
    Sketches.writeCardinalitySketches(docs.repartition(13), "h", "shard", s"$dir2/sk")
    val merged2 = Sketches.estimateDistinct(spark, s"$dir2/sk")
    assert(math.abs(merged2 - exact) * 100 <= exact * 5,
      s"union estimate $merged2 vs exact $exact (repartitioned build)")
  }

  test("hll: shard append composes; subset estimates read the subset") {
    import graft.operators.Sketches
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select((col("doc_id") % 8).as("shard"),
        md5(col("text").cast("binary")).as("h"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_spec3").toString
    Sketches.writeCardinalitySketches(
      docs.filter(col("shard") < 4), "h", "shard", s"$dir/sk")
    Sketches.writeCardinalitySketches(
      docs.filter(col("shard") >= 4), "h", "shard", s"$dir/sk")
    // append-built and single-pass-built tables both estimate inside
    // the bound (sketch bytes differ with insertion order, estimates
    // stay bounded)
    val exact = docs.agg(countDistinct(col("h"))).head().getLong(0)
    val appended = Sketches.estimateDistinct(spark, s"$dir/sk")
    assert(math.abs(appended - exact) * 100 <= exact * 5,
      s"append-built union estimate $appended vs exact $exact")
    val subsetExact = docs.filter(col("shard") === 2)
      .agg(countDistinct(col("h"))).head().getLong(0)
    val subsetEst = Sketches.estimateDistinct(spark, s"$dir/sk", Seq(2L))
    assert(math.abs(subsetEst - subsetExact) * 100 <= subsetExact * 5)
  }

  test("histogram sketch: hand-verified quantile bins, append merge, shard subset") {
    import graft.operators.Sketches
    // values 1..100, shard by parity; binWidth 10 → bin b holds
    // values [10b, 10b+9]; rank(p50)=50 → value 50 → bin 5 (cum at
    // bin 4 = 49 values 1..49; bin 5 spans 50..59 cum 59 ≥ 50)
    val docs = (1L to 100L).map(v => (v % 2, v)).toDF("shard", "v")
    val dir = java.nio.file.Files.createTempDirectory("histsk").toString
    Sketches.writeHistogramSketch(docs.filter($"shard" === 0L), "v", "shard", s"$dir/sk", 10L)
    Sketches.writeHistogramSketch(docs.filter($"shard" === 1L), "v", "shard", s"$dir/sk", 10L)
    val q = Sketches.quantilesFromSketch(spark, s"$dir/sk", 10L, Seq(50, 90, 99, 100))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(q(50L) === ((5L, 50L, 60L, 100L)))
    assert(q(90L) === ((9L, 90L, 100L, 100L)))  // rank 90 → value 90 → bin 9
    assert(q(99L) === ((9L, 90L, 100L, 100L)))
    assert(q(100L) === ((10L, 100L, 110L, 100L))) // max value 100 → bin 10
    // one-shot write must agree with the two-append write (merge algebra)
    val dir2 = java.nio.file.Files.createTempDirectory("histsk1").toString
    Sketches.writeHistogramSketch(docs, "v", "shard", s"$dir2/sk", 10L)
    val q1 = Sketches.quantilesFromSketch(spark, s"$dir2/sk", 10L, Seq(50, 90, 99, 100))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q1 === q.map { case (k, v) => k -> v._1 })
    // shard subset: odd values only (1,3,...,99): rank(p50)=25 → 25th
    // odd = 49 → bin 4
    val sub = Sketches.quantilesFromSketch(spark, s"$dir/sk", 10L, Seq(50), Seq(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(sub.toSeq === Seq((50L, 4L, 50L)))
  }

  test("the gate contract holds at every local SF") {
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val docs = Tables(spark, s"/root/testdata/sf$sf", "documents")
      val rows = CorpusStats.heavyHitterCheck(docs, "text", Seq("join", "scan", "the"))
        .collect()
      assert(rows.length === 3, sf)
      assert(rows.forall(_.getBoolean(2)), s"CMS bound must hold at sf$sf: ${rows.toSeq}")
      assert(rows.exists(_.getLong(1) > 0), s"markers should occur at sf$sf")
    }
  }
  test("D134 kmv: sketch is the k smallest distinct hashes, partition-invariant; estimate exact below k") {
    import graft.operators.Sketches
    import org.apache.spark.sql.functions._
    val rows = (0 until 500).map(i => (if (i % 2 == 0) "a" else "b", s"v${i % 300}"))
    // group a sees v0,v2,...,v298 (150 distinct); b sees 150 odd ones
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val sk = Sketches.kmvSketch(df, "g", "v", k = 32)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      // per group: exactly 32 rows, ranks 1..32, hashes strictly ascending
      for (g <- Seq("a", "b")) {
        val rowsG = sk.filter(_._1 == g).sortBy(_._3)
        assert(rowsG.length === 32)
        assert(rowsG.map(_._3).toSeq === (1 to 32))
        assert(rowsG.map(_._2).toSeq === rowsG.map(_._2).sorted.toSeq)
      }
      // brute-force reference: k smallest of the exact distinct hash set
      val all = df.filter(col("g") === "a")
        .select(conv(substring(md5(col("v").cast("binary")), 1, 12), 16, 10)
          .cast("long").as("h")).distinct()
        .collect().map(_.getLong(0)).sorted.take(32).toSeq
      assert(sk.filter(_._1 == "a").sortBy(_._3).map(_._2).toSeq === all,
        "sketch must be exactly the k smallest distinct hashes")
    }
    // below k: estimate is the exact distinct count
    val tiny = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z"))
      .toDF("g", "v")
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(tiny, "g", "v", 32), 32)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(est === Map("a" -> 2L, "b" -> 1L))
  }

  test("D134 kmv set ops: disjoint and identical value sets give the hand-computable extremes") {
    import graft.operators.Sketches
    import org.apache.spark.sql.functions._
    val k = 16
    // identical sets: union == each set, n_both == k, est_inter == est_union
    val same = (0 until 200).flatMap(i => Seq(("p", s"u$i"), ("q", s"u$i")))
      .toDF("g", "v")
    val skSame = Sketches.kmvSketch(same, "g", "v", k)
    val eSame = Sketches.kmvSetEstimates(skSame, k).collect().head
    assert(eSame.getLong(2) === k.toLong)   // n_u: merged sketch is the same k hashes
    assert(eSame.getLong(3) === k.toLong)   // n_both: every one present in both
    assert(eSame.getLong(4) === eSame.getLong(5), "identical sets: est_inter == est_union")
    // disjoint sets: n_both == 0 -> est_inter == 0
    val disj = ((0 until 200).map(i => ("p", s"l$i")) ++
      (0 until 200).map(i => ("q", s"r$i"))).toDF("g", "v")
    val eDisj = Sketches.kmvSetEstimates(Sketches.kmvSketch(disj, "g", "v", k), k)
      .collect().head
    assert(eDisj.getLong(3) === 0L)
    assert(eDisj.getLong(5) === 0L, "disjoint sets: est_inter == 0")
    // union estimator sanity on the disjoint case: ~400 true distinct
    val estU = eDisj.getLong(4)
    assert(estU > 200 && estU < 800, s"union estimate $estU wildly off 400")
  }

  test("D134 kmv shard table: append composes, shard delete is exact, crashed swap recovers") {
    import graft.operators.Sketches
    import org.apache.spark.sql.functions._
    val k = 16
    val rows = (0 until 900).map(i => (s"g${i % 2}", s"v${i % 600}", (i % 3).toString))
    val df = rows.toDF("g", "v", "shard")
    val dir = java.nio.file.Files.createTempDirectory("kmv_shards").resolve("t").toString
    for (sh <- Seq("0", "1", "2"))
      Sketches.writeKmvShard(df.filter(col("shard") === sh), "g", "v", k, dir, sh)
    def est(shards: Option[Seq[String]]) =
      Sketches.kmvEstimateFromShards(spark, dir, shards)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // merged == one-shot sketch over the same data
    def oneShot(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvEstimate(Sketches.kmvSketch(d, "g", "v", k), k)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(est(None) === oneShot(df))
    assert(est(Some(Seq("0", "2"))) === oneShot(df.filter(col("shard") =!= "1")))
    // mixed-k append refuses
    intercept[IllegalArgumentException] {
      Sketches.writeKmvShard(df.limit(5), "g", "v", k + 1, dir, "3")
    }
    // shard delete: estimates equal the from-scratch table without it
    Sketches.removeKmvShard(spark, dir, "1")
    assert(est(None) === oneShot(df.filter(col("shard") =!= "1")),
      "post-delete estimates must equal the remaining corpus' sketch")
    // crashed swap: rows moved aside as a COMPLETE staging, live gone
    val livePath = java.nio.file.Paths.get(s"$dir/rows")
    java.nio.file.Files.move(livePath, java.nio.file.Paths.get(s"$dir/rows__staging"))
    assert(est(None) === oneShot(df.filter(col("shard") =!= "1")),
      "a read must republish the staged rows")
    assert(new java.io.File(s"$dir/rows").exists())
  }

  test("D135 CountSketch: exact on isolated values, signed collisions cancel in the median, deterministic") {
    import graft.operators.Sketches
    import spark.implicits._
    val width = 64; val depth = 5
    // one value repeated n times: every cell it touches holds ONLY its
    // own contribution, so the median estimate is exactly n
    val solo = Seq.fill(37)("alpha").toDF("w")
    val gSolo = Sketches.countSketchGrid(solo, "w", width, depth)
    assert(gSolo.count() === depth.toLong,
      "a single distinct value occupies exactly one cell per row")
    val eSolo = Sketches.countSketchEstimates(gSolo, Seq("alpha"), width, depth)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eSolo("alpha") === 37L)
    // absent marker on an empty-ish grid: all its cells are 0 or
    // collision noise; on the EMPTY grid it is exactly 0
    val eAbsent = Sketches.countSketchEstimates(
        Sketches.countSketchGrid(Seq.empty[String].toDF("w"), "w", width, depth),
        Seq("ghost"), width, depth)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eAbsent("ghost") === 0L)
    // mixed corpus: heavy marker among noise — the median estimate is
    // within the CountSketch error envelope (generous bound; the GATE
    // pins the exact value against the oracle, this spec pins sanity)
    val rng = new scala.util.Random(11L)
    val noise = (0 until 2000).map(_ => s"n${rng.nextInt(500)}")
    val mixed = (Seq.fill(300)("heavy") ++ noise).toDF("w")
    val gMixed = Sketches.countSketchGrid(mixed, "w", width, depth)
      .localCheckpoint()
    val eMixed = Sketches.countSketchEstimates(gMixed, Seq("heavy"), width, depth)
      .collect().head.getLong(1)
    assert(math.abs(eMixed - 300L) <= 150L,
      s"median estimate $eMixed too far from true 300")
    // deterministic + partition-invariant: same grid under repartition
    val gRepart = Sketches.countSketchGrid(mixed.repartition(7), "w", width, depth)
    assert(gRepart.orderBy("r", "bucket").collect().toSeq ===
      gMixed.orderBy("r", "bucket").collect().toSeq)
    // an even depth has no exact median — refused
    intercept[IllegalArgumentException] {
      Sketches.countSketchGrid(solo, "w", width, 4)
    }
  }

  test("D135b grids merge by cellwise sum; AMS inner product is exact on a non-colliding overlap") {
    import graft.operators.Sketches
    import spark.implicits._
    val width = 64; val depth = 5
    val sliceA = (Seq.fill(10)("x") ++ Seq.fill(5)("y")).toDF("w")
    val sliceB = (Seq.fill(3)("x") ++ Seq.fill(7)("z")).toDF("w")
    val ga = Sketches.countSketchGrid(sliceA, "w", width, depth).localCheckpoint()
    val gb = Sketches.countSketchGrid(sliceB, "w", width, depth).localCheckpoint()
    // linearity: the union's grid equals the cellwise sum of the
    // slices' grids — the property epoch/shard merging relies on
    val gUnion = Sketches.countSketchGrid(sliceA.union(sliceB), "w", width, depth)
    val gMerged = Sketches.countSketchMerge(ga.union(gb))
    assert(gMerged.orderBy("r", "bucket").collect().toSeq ===
      gUnion.orderBy("r", "bucket").collect().toSeq)
    // inner product: only "x" is shared → Σ f·g = 10·3 = 30; same
    // token gets the same sign in both grids, so the product is +30
    // in every non-colliding row and the median is exact
    val est = Sketches.countSketchInner(ga, gb, depth).collect().head.getLong(0)
    assert(est === 30L)
    // disjoint slices: exact inner product 0, and with these tokens
    // not colliding the estimate is exactly 0 too
    val gc = Sketches.countSketchGrid(Seq.fill(9)("q").toDF("w"), "w", width, depth)
    assert(Sketches.countSketchInner(gb, gc, depth)
      .collect().head.getLong(0) === 0L)
  }

  test("D135c CountSketch top-k: finds the true heavy set, exact-verifies it, ranks deterministically") {
    import graft.operators.Sketches
    import spark.implicits._
    val width = 256; val depth = 5
    // skewed corpus: three unambiguous heavies over a light-noise tail
    val rng = new scala.util.Random(23L)
    val corpus = (Seq.fill(400)("aa_top") ++ Seq.fill(250)("bb_mid") ++
      Seq.fill(120)("cc_low") ++ (0 until 800).map(_ => s"n${rng.nextInt(400)}"))
    val df = corpus.toDF("w")
    val top = Sketches.countSketchTopK(df, "w", width, depth, 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // the heavy set is found, in rank order, with EXACT true counts —
    // the estimate column may carry collision noise, the recount not
    assert(top.map(t => (t._1, t._3, t._4)).toSeq ===
      Seq(("aa_top", 400L, 1), ("bb_mid", 250L, 2), ("cc_low", 120L, 3)))
    // estimates are within the CS envelope of the truth (sanity; the
    // GATE pins them value-exactly against the oracle)
    top.foreach { case (w, est, n, _) =>
      assert(math.abs(est - n) <= 80L, s"$w: est $est vs true $n")
    }
    // k past the vocabulary returns the whole vocabulary, still ranked
    val tiny = Seq("p", "p", "q").toDF("w")
    val all = Sketches.countSketchTopK(tiny, "w", width, depth, 10)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3)))
    assert(all.toSeq === Seq(("p", 2L, 1), ("q", 1L, 2)))
    // deterministic tie-break: equal estimates rank by token ASC
    val tied = Seq("b_tok", "a_tok").toDF("w")
    val ranks = Sketches.countSketchTopK(tied, "w", width, depth, 2)
      .collect().map(r => (r.getString(0), r.getInt(3))).toMap
    assert(ranks("a_tok") < ranks("b_tok"))
    intercept[IllegalArgumentException] {
      Sketches.countSketchTopK(tiny, "w", width, depth, 0)
    }
  }

  test("countSketchTopKFrom over merged partials equals the one-shot batch extraction") {
    import graft.operators.Sketches
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val width = 256; val depth = 5
    val rng = new scala.util.Random(31L)
    val corpus = (Seq.fill(90)("hh_one") ++ Seq.fill(40)("hh_two") ++
      (0 until 300).map(_ => s"n${rng.nextInt(80)}"))
    val df = corpus.toDF("w")
    // split into two "epochs", build each partial independently, merge
    val (e1, e2) = corpus.splitAt(corpus.size / 2)
    def gridOf(s: Seq[String]) = Sketches.countSketchGrid(s.toDF("w"), "w", width, depth)
    def countsOf(s: Seq[String]) = s.toDF("w")
      .groupBy(col("w").as("token")).agg(count(lit(1)).as("true_count"))
    val merged = Sketches.countSketchMerge(gridOf(e1).union(gridOf(e2)))
    val counts = countsOf(e1).union(countsOf(e2))
      .groupBy("token").agg(sum("true_count").as("true_count"))
    val streamed = Sketches.countSketchTopKFrom(merged, counts, width, depth, 5)
      .orderBy("rank").collect().toSeq
    val oneShot = Sketches.countSketchTopK(df, "w", width, depth, 5)
      .orderBy("rank").collect().toSeq
    assert(streamed === oneShot)
  }

}
