package graft

import graft.operators.{Sampling, TopK}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks for the order-sensitive operators: results
  * must equal a brute-force reference and be independent of physical
  * partitioning (the property that actually matters on a cluster,
  * where partition counts differ run to run).
  */
class OperatorPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randomRows(seed: Long, n: Int): Seq[(String, Double, Long)] = {
    val rng = new scala.util.Random(seed)
    // coarse scores force plenty of ties → the id tiebreak is exercised
    (0 until n).map(i => (s"g${rng.nextInt(5)}", rng.nextInt(20).toDouble, i.toLong))
  }

  test("topKPerGroup equals the sort-based reference on random data, any partitioning") {
    for (seed <- Seq(1L, 7L, 99L)) {
      val rows = randomRows(seed, 500)
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(4).zipWithIndex
          .map { case ((_, s, id), i) => (g, id, s, i + 1) }
      }.toSet
      for (parts <- Seq(1, 7)) {
        val df = rows.toDF("g", "score", "id").repartition(parts)
        val got = TopK.topKPerGroup(df, "g", "score", "id", 4)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
        assert(got === expected, s"seed=$seed parts=$parts")
      }
    }
  }

  test("topKPerGroup handles groups smaller than k and k buffer overflow") {
    val rows = (0 until 300).map(i => ("one", i.toDouble, i.toLong)) :+ (("tiny", 1.0, 999L))
    val got = TopK.topKPerGroup(rows.toDF("g", "score", "id"), "g", "score", "id", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    assert(got.count(_._1 == "one") === 3)
    assert(got.filter(_._1 == "one").map(_._2).sorted.toSeq === Seq(297L, 298L, 299L))
    assert(got.filter(_._1 == "tiny") === Array(("tiny", 999L, 1)))
  }

  test("deterministic sampling is invariant to partitioning and repeatable") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.deterministicPerGroup(df, Seq("l_returnflag"),
          Seq("l_orderkey", "l_linenumber"), n = 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val a = run(docs)
    val b = run(docs.repartition(13))
    val c = run(docs)
    assert(a === b, "sample must not depend on physical partitioning")
    assert(a === c, "sample must be repeatable")
    // a different seed draws a different sample
    val other = Sampling.deterministicPerGroup(docs, Seq("l_returnflag"),
        Seq("l_orderkey", "l_linenumber"), n = 7, seed = 43L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(other !== a, "seed must change the draw")
  }

  test("topKPerGroup restores round-trippable group types and rejects NULLs loudly") {
    import org.apache.spark.sql.functions._
    val df = Seq((1, 10.0, 100L), (1, 20.0, 101L), (2, 5.0, 102L))
      .toDF("g", "score", "id")
    val out = graft.operators.TopK.topKPerGroup(df, "g", "score", "id", 1)
    assert(out.schema("g").dataType.typeName === "integer") // not string
    assert(out.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ===
      Set((1, 101L), (2, 102L)))
    val withNull = Seq((1, Some(1.0), 1L), (1, None, 2L)).toDF("g", "score", "id")
    val err = intercept[Exception] {
      graft.operators.TopK.topKPerGroup(withNull, "g", "score", "id", 1).collect()
    }
    assert(err.getMessage.contains("NULL") || err.getCause != null, err.getMessage)
  }

  private def runJaccard(df: org.apache.spark.sql.DataFrame, threshold: Double, cap: Int) =
    graft.operators.Dedup.jaccardPairs(df, "doc_id", "text", 3, threshold, maxShingleDf = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("incremental view maintenance equals full recompute on random mutation streams") {
    import graft.operators.MergeUpsert
    for (seed <- Seq(3L, 17L, 71L)) {
      val rng = new scala.util.Random(seed)
      val groups = Vector("a", "b", "c", "d")
      val before = (0L until 200L).map(id =>
        (id, groups(rng.nextInt(4)), rng.nextInt(1000).toLong))
      // random mutation: ~1/4 deleted, ~1/4 updated (value and/or
      // group), ~1/8 of ids re-inserted under fresh keys
      val after = before.flatMap { case (id, g, v) =>
        rng.nextInt(4) match {
          case 0 => None                                         // delete
          case 1 => Some((id, groups(rng.nextInt(4)), rng.nextInt(1000).toLong))
          case _ => Some((id, g, v))                             // keep
        }
      } ++ (0 until 25).map(i =>
        (1000L + i, groups(rng.nextInt(4)), rng.nextInt(1000).toLong))
      val bdf = before.toDF("id", "g", "v")
      val adf = after.toDF("id", "g", "v")
      val sums = bdf.groupBy("g")
        .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_val"))
      val mm = bdf.groupBy("g")
        .agg(count(lit(1)).as("n_rows"), min("v").as("min_val"), max("v").as("max_val"))
      for (parts <- Seq(1, 5)) {
        val gotSums = MergeUpsert.maintainGroupSums(sums,
            bdf.repartition(parts), adf, "id", "g", "v")
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        val fullSums = adf.groupBy("g")
          .agg(count(lit(1)).as("n"), sum("v").as("s"))
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        assert(gotSums === fullSums, s"sums seed=$seed parts=$parts")
        val gotMm = MergeUpsert.maintainGroupMinMax(mm,
            bdf.repartition(parts), adf, "id", "g", "v")
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        val fullMm = adf.groupBy("g")
          .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        assert(gotMm === fullMm, s"minmax seed=$seed parts=$parts")
      }
    }
  }

  test("signatureEstimateAudit: identical docs estimate exactly, bounds hold, partition-invariant") {
    import graft.operators.Dedup
    // docs 1/2 identical -> every minhash component matches: n_match =
    // 12, est = jaccard = 1000000, err = 0. Docs 3/4 share a real
    // overlap -> the pair surfaces with n_match in [0, 12] and
    // est_ppm = n_match * 1000000 div 12 exactly.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine eleven"))
      .toDF("doc_id", "text")
    val got = Dedup.signatureEstimateAudit(docs, "doc_id", "text", 3, 12, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.contains((1L, 2L)))
    assert(got((1L, 2L)) === ((12L, 1000000L, 1000000L, 0L)))
    got.foreach { case (_, (nMatch, est, jac, err)) =>
      assert(nMatch >= 0L && nMatch <= 12L)
      assert(est === nMatch * 1000000L / 12L)
      assert(err === est - jac)
      assert(jac >= 0L && jac <= 1000000L)
    }
    val again = Dedup.signatureEstimateAudit(docs.repartition(5), "doc_id", "text", 3, 12, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(again === got)
  }

  test("bandingPlanAudit: all divisor plans, exact-dup recall 1e6, monotone in r, argmax chosen, partition-invariant") {
    import graft.operators.Dedup
    // docs 1/2 identical -> the one wanted pair (m = 12): every plan
    // collides it with probability exactly 1, so catch_ppm = 1000000
    // across the board. Docs 3/4 share one shingle with 1 -> unwanted
    // pairs populating the false side. Collision probability is
    // pointwise non-increasing in r at fixed m, so both means are too.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma iota kappa lambda mu nu xi"),
      (4L, "alpha beta gamma rho sigma tau upsilon phi chi"))
      .toDF("doc_id", "text")
    val rows = Dedup.bandingPlanAudit(docs, "doc_id", "text",
        shingleN = 3, numHashes = 12, thresholdPpm = 600000L)
      .orderBy("rows_per_band").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(rows.map(t => (t._1, t._2)).toSeq ===
      Seq((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1)))
    rows.foreach { case (r, b, nw, nu, c, f, e, _) =>
      assert(r * b === 12)
      assert(nw === 1L, "exactly the identical pair is wanted")
      assert(nu >= 1L, "the shared-shingle pairs are unwanted candidates")
      assert(c === 1000000L, "an exact dup survives every plan")
      assert(f >= 0L && f <= 1000000L)
      assert(e >= c, "expected collisions include the wanted pair")
    }
    // monotone: fewer, longer bands collide less at every m
    rows.sliding(2).foreach { case Array(a, bb) =>
      assert(a._5 >= bb._5, s"catch_ppm must not increase with r")
      assert(a._6 >= bb._6, s"false_ppm must not increase with r")
    }
    // chosen == recomputed argmax(catch - false, tie-break smaller r)
    val want = rows.maxBy(t => (t._5 - t._6, -t._1))
    assert(rows.filter(_._8).toSeq === Seq(want))
    val again = Dedup.bandingPlanAudit(docs.repartition(7), "doc_id", "text",
        shingleN = 3, numHashes = 12, thresholdPpm = 600000L)
      .orderBy("rows_per_band").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(again.toSeq === rows.toSeq)
  }

  test("jaccardPairs posting-list cap: identical pairs when near-dups share rare shingles") {
    // 40 docs in 20 near-dup pairs; EVERY doc also carries a universal
    // boilerplate phrase (df=40). With the cap the universal shingles
    // leave the candidate index, but each pair still meets through its
    // rare body shingles — results must be identical, including
    // n_inter, because verification uses the full shingle sets.
    val paired = (0 until 40).map { i =>
      val p = i / 2
      val body = (0 until 12).map(k => s"w${p}x$k").mkString(" ")
      (i.toLong, s"common boiler phrase $body" + (if (i % 2 == 1) " tailvariant" else ""))
    }
    val df = paired.toDF("doc_id", "text")
    val uncapped = runJaccard(df, 0.5, cap = -1)
    val capped = runJaccard(df, 0.5, cap = 10)
    assert(uncapped.size === 20)
    assert(capped === uncapped)
  }

  test("lshCalibration pair sampling: filter-then-verify equals the seeded draw over the census pairs") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Sampling}
    val paired = (0 until 40).map { i =>
      val p = i / 2
      val body = (0 until 12).map(k => s"w${p}x$k").mkString(" ")
      (i.toLong, s"calib probe here $body" + (if (i % 2 == 1) " tailvariant" else ""))
    }
    val df = paired.toDF("doc_id", "text")
    // expected: replay the draw over the CENSUS pair set (verify-then-
    // filter) — the operator samples BEFORE verification, so equality
    // proves sampling changes cost, not results, for surviving pairs
    // census at threshold 0 over the df-capped blocking — exactly the
    // calibration audit's stated candidate contract (the lossless
    // default path is meaningless at threshold 0)
    val census = Dedup.jaccardPairs(df, "doc_id", "text", 3, threshold = 0.0,
      maxShingleDf = 1000)
    val expected = census
      .filter(Sampling.hashMod(42L, col("d1"), col("d2")) % 2 === 0)
      .withColumn("decile", least(floor(col("jaccard") * 10).cast("int"), lit(9)))
      .groupBy("decile").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sampled = Dedup.lshCalibration(df, "doc_id", "text",
        n = 3, numHashes = 12, numBands = 4, samplePairMod = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sampled === expected)
    val full = Dedup.lshCalibration(df, "doc_id", "text",
        n = 3, numHashes = 12, numBands = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sampled.values.sum < full.values.sum, "the draw must be a strict subsample here")
    assert(full.values.sum === census.count())
  }

  test("Sampling.hashMod pins the portable md5 draw the oracles replay") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sampling
    // the q_ann_recall / q_trunc_recall oracles hard-replay this exact
    // draw in DuckDB SQL; if the Spark-side token format or hex slice
    // ever drifts, this pin breaks before the gates do
    val ids = (0L until 10L).toDF("vec_id")
    val kept = ids.filter(Sampling.hashMod(42L, col("vec_id")) % 2 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 5L, 9L))
  }

  test("jaccardPairs posting-list cap bounds candidates under one universal shingle") {
    // adversarial: 50 docs share ONLY one boilerplate phrase. Without
    // the cap all 50*49/2 pairs reach verification (the k-squared skew
    // bomb); with it no candidate survives, so the pair join never
    // materializes the quadratic set.
    val adv = (0 until 50).map(i =>
      (i.toLong, s"universal shingle here u${i}a u${i}b u${i}c u${i}d")).toDF("doc_id", "text")
    assert(runJaccard(adv, 0.1, cap = -1).size === 50 * 49 / 2)
    assert(runJaccard(adv, 0.1, cap = 10).isEmpty)
  }

  private def runPrefix(df: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) =
    graft.operators.Dedup.prefixFilteredPairs(df, "doc_id", "text", 3, tNum, tDen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("prefixFilteredPairs equals uncapped jaccardPairs (lossless), any partitioning") {
    val rng = new scala.util.Random(23L)
    val vocab = (0 until 40).map(i => s"v$i")
    val base = (0 until 30).map { i =>
      (i.toLong, (0 until 15).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    // planted near-dups: copy with one word appended
    val dups = (0 until 10).map(i => (100L + i, base(i)._2 + " extraword"))
    for (parts <- Seq(1, 7)) {
      val df = (base ++ dups).toDF("doc_id", "text").repartition(parts)
      val expected = runJaccard(df, 0.6, cap = -1)
      assert(runPrefix(df, 3, 5) === expected)
      assert(expected.size >= 10)
    }
  }

  test("prefixFilteredPairs keeps pairs whose ONLY shared shingles are boilerplate-hot") {
    // the recall case the df-cap loses: 2 identical docs made entirely
    // of a phrase that also appears in 48 other docs — every shared
    // shingle has df=50, so cap=10 drops the pair but the prefix
    // filter must keep it (prefixes still contain the hot shingles;
    // they are just ordered last among each doc's own keys).
    val hot = "alpha beta gamma delta epsilon"
    val clones = Seq((0L, hot), (1L, hot))
    val others = (2 until 50).map(i => (i.toLong, s"$hot unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e unique${i}f"))
    val df = (clones ++ others).toDF("doc_id", "text")
    assert(runJaccard(df, 0.99, cap = 10).isEmpty) // df-cap loses it
    val got = runPrefix(df, 99, 100)
    assert(got.contains((0L, 1L, 3)), s"prefix filter must recover the clone pair, got $got")
  }

  test("jaccardPairs accepts any small-rational threshold on the lossless path; irrational falls back instead of throwing") {
    import graft.operators.Dedup
    // continued-fraction fit: exact small rationals in, None out
    assert(Dedup.asExactRational(0.6, 1000) === Some((3, 5)))
    assert(Dedup.asExactRational(1.0 / 3, 1000) === Some((1, 3)))
    assert(Dedup.asExactRational(0.125, 1000) === Some((1, 8)))
    assert(Dedup.asExactRational(19.0 / 37, 1000) === Some((19, 37)))
    assert(Dedup.asExactRational(1.0, 1000) === Some((1, 1)))
    assert(Dedup.asExactRational(math.sqrt(0.5), 1000) === None)
    assert(Dedup.asExactRational(0.0, 1000) === None)
    // hostile inputs whose continued fraction hits a huge partial
    // quotient (tiny fractional residue → r explodes): must return
    // None via the a > maxDen bail, never overflow into a garbage
    // Some (round-15 advice)
    assert(Dedup.asExactRational(0.1 + 1e-13, 1000) === None)
    assert(Dedup.asExactRational(1.0 - 1e-15, 1000) === None)
    assert(Dedup.asExactRational(java.lang.Double.MIN_VALUE, 1000) === None)
    val rng = new scala.util.Random(31L)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (0 until 25).map { i =>
      (i.toLong, (0 until 15).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val dups = (0 until 8).map(i => (100L + i, base(i)._2 + " tailword"))
    val df = (base ++ dups).toDF("doc_id", "text")
    // r13 threw IllegalArgumentException for both of these (callers
    // like Curate passing 1.0/3 or 0.125 regressed); now they route
    // through the prefix machinery and equal the uncapped blocking
    for (t <- Seq(1.0 / 3, 0.125, 19.0 / 37)) {
      assert(runJaccard(df, t, cap = 0) === runJaccard(df, t, cap = -1),
        s"default (lossless) path at threshold $t must equal the uncapped blocking")
    }
    // a threshold no small rational reproduces must not throw — it
    // falls back to the uncapped inverted index
    val irr = math.sqrt(0.35)
    assert(runJaccard(df, irr, cap = 0) === runJaccard(df, irr, cap = -1))
    // impossible thresholds fail fast instead of silently burning the
    // quadratic fallback to return an empty result
    for (bad <- Seq(1.5, 0.0, -0.3, Double.NaN)) {
      intercept[IllegalArgumentException] {
        graft.operators.Dedup.jaccardPairs(df, "doc_id", "text", 3, bad)
      }
    }
  }

  test("asExactRational property: any p/q with q<=1000 round-trips to an exact (and minimal-denominator) rational") {
    import graft.operators.Dedup
    val rng = new scala.util.Random(97L)
    for (_ <- 0 until 500) {
      val q = 1 + rng.nextInt(1000)
      val p = 1 + rng.nextInt(q) // threshold in (0, 1]
      val x = p.toDouble / q
      val got = Dedup.asExactRational(x, 1000)
      assert(got.isDefined, s"$p/$q must be representable")
      val (pp, qq) = got.get
      assert(pp.toDouble / qq == x, s"$pp/$qq must reproduce $x bitwise")
      assert(qq <= q, s"convergents must not inflate the denominator: got $qq for $p/$q")
    }
    // randoms that are (almost surely) not small rationals return None
    for (_ <- 0 until 200) {
      val x = rng.nextDouble()
      Dedup.asExactRational(x, 1000).foreach { case (pp, qq) =>
        assert(pp.toDouble / qq == x) // if claimed, it must be exact
      }
    }
  }

  test("prefixFilteredPairs candidate economics: one universal shingle joins only via prefixes") {
    // 50 docs sharing one hot phrase + unique bodies at threshold 0.6:
    // no true pairs, and the hot shingles sit past every prefix (rank
    // by ascending df puts df=50 keys last), so the verified output is
    // empty WITHOUT the quadratic candidate set the uncapped inverted
    // index would build.
    val adv = (0 until 50).map(i =>
      (i.toLong, s"universal shingle here u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")).toDF("doc_id", "text")
    assert(runPrefix(adv, 3, 5).isEmpty)
  }

  test("editDistancePairs prefix blocking: df-cap passing pairs are a subset, corpus result identical") {
    import graft.operators.Dedup
    // round 13 moved D62's blocking from the df-capped inverted index
    // to the D68 prefix+positional block at Jaccard 3/5. The old
    // blocking's PASSING pairs on the test corpus all carry shingle
    // Jaccard >= 0.78 (measured), so the new result must contain every
    // one of them — and on this corpus be exactly equal.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val oldStyle = finalPairsOn(docs,
      Dedup.blockedCandidatePairs(docs, "doc_id", "text", 3, 1000))
    val newStyle = Dedup.editDistancePairs(docs, "doc_id", "text", n = 3, maxDistPct = 20)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oldStyle.subsetOf(newStyle),
      s"prefix blocking lost df-cap pairs: ${oldStyle -- newStyle}")
    assert(newStyle === oldStyle,
      s"corpus result diverged: extra=${newStyle -- oldStyle}")
    // blind-spot comparison, pinned explicitly (blocking for an edit-
    // distance predicate is inherently heuristic in shingle space —
    // each blocking has a different corner):
    // (i) the case the df-CAP loses and prefix KEEPS: identical docs
    //     whose every shingle is corpus-hot (J = 1.0)
    val hot = "alpha beta gamma delta epsilon zeta eta theta"
    val clones = Seq((1000L, hot), (1001L, hot))
    val others = (0 until 30).map(i =>
      (1100L + i, s"$hot filler${i}a filler${i}b filler${i}c filler${i}d filler${i}e"))
    val df = (clones ++ others).toDF("doc_id", "text")
    val capped = finalPairsOn(df, Dedup.blockedCandidatePairs(df, "doc_id", "text", 3, 10))
    val prefix = Dedup.editDistancePairs(df, "doc_id", "text", n = 3, maxDistPct = 20)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.contains((1000L, 1001L)), "df-cap=10 loses the hot-shingle clone pair")
    assert(prefix.contains((1000L, 1001L)), s"prefix blocking must keep it, got $prefix")
    // (ii) the converse corner, OUT of the new contract by design: a
    //     SHORT doc pair one token apart has lev well under 20% but
    //     shingle Jaccard (g-n)/(g+n) = 0.33 < 3/5 — the blocking
    //     threshold is the documented contract, replayed by the
    //     oracle, and this pins it
    val short = Seq((2000L, hot), (2001L, hot.replace("zeta", "zetX")))
      .toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(short, "doc_id", "text", n = 3, maxDistPct = 20)
      .count() === 0L)
  }

  private def finalPairsOn(docs: org.apache.spark.sql.DataFrame,
      cand: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val t = docs.select(col("doc_id"), col("text"))
    cand
      .join(t.select(col("doc_id").as("d1"), col("text").as("t1")), "d1")
      .join(t.select(col("doc_id").as("d2"), col("text").as("t2")), "d2")
      .withColumn("max_len", greatest(length(col("t1")), length(col("t2"))).cast("long"))
      .withColumn("__k", (col("max_len") * 20L / lit(100L)).cast("int"))
      .filter(expr("levenshtein(t1, t2, __k)") >= 0)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("containmentPairs lossless blocking equals brute force over ALL pairs") {
    import graft.operators.Dedup
    // the asymmetric prefix+positional block must find every pair with
    // containment >= t — compare against an unblocked all-pairs
    // reference on a corpus with hot shingles, planted containments,
    // and a pair whose ONLY shared shingles are hot (the df-cap-loss
    // case)
    val rng = new scala.util.Random(31L)
    val vocab = (0 until 25).map(i => s"v$i")
    val base = (0 until 25).map { i =>
      (i.toLong, (0 until 12).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val contained = (0 until 6).map { i =>
      (200L + i, base(i)._2 + " " + (0 until 12).map(_ => s"tail${i}x${rng.nextInt(9)}").mkString(" "))
    }
    val hotPair = Seq((300L, "v0 v1 v2 v3 v4 v5"), (301L, "v0 v1 v2 v3 v4 v5"))
    for (parts <- Seq(1, 5)) {
      val df = (base ++ contained ++ hotPair).toDF("doc_id", "text").repartition(parts)
      val sh = df.select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, greatest(size(ws)-3, 0) - 1), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("shingle"))
        .distinct().localCheckpoint()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val ids = sizes.select("doc_id", "n_sh").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val shSets = sh.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getString(1)).toSet).toMap
      val expected = (for {
        a <- ids.keys; b <- ids.keys if a < b
        inter = shSets(a).intersect(shSets(b)).size
        small = math.min(ids(a), ids(b)) if small > 0
        if inter * 100 >= small * 60
      } yield (a, b)).toSet
      val got = Dedup.containmentPairs(df, "doc_id", "text", n = 3, thresholdPct = 60)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"parts=$parts")
      assert(expected.contains((300L, 301L)), "hot-only pair must be in the reference")
    }
  }

  test("duplicatedSpans: hand-verified counts, cross-document only, partition-invariant") {
    val docs = Seq(
      (0L, "a b c d e f"),        // all 4 trigram starts shared with d1/d4
      (1L, "x a b c d y"),        // starts 1,2 duplicated (a b c / b c d)
      (2L, "z z z"),              // unique gram, no dups
      (3L, "q r"),                // too short for a trigram
      (4L, "a b c d e f"),        // exact copy of d0
      (5L, "m n o p m n o p")     // WITHIN-doc repeat only: not cross-doc
    ).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.duplicatedSpans(df, "doc_id", "text", n = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    val got = run(docs)
    assert(got(0L) === ((6, 4L, 6L, 0)))  // starts 0..3 dup, tokens 0..5 covered
    assert(got(1L) === ((6, 2L, 4L, 1)))  // starts 1,2 -> tokens {1,2,3,4}
    assert(got(2L) === ((3, 0L, 0L, -1)))
    assert(got(3L) === ((2, 0L, 0L, -1))) // short doc still reported
    assert(got(4L) === ((6, 4L, 6L, 0)))
    // "m n o" repeats twice inside d5 but in NO other doc: cross-document
    // criterion (count distinct doc_id >= 2) must not flag it
    assert(got(5L) === ((8, 0L, 0L, -1)))
    assert(run(docs.repartition(5)) === got)
  }

  test("D113 incremental spans: corpus-index probe, append composes, batch-internal repeats don't flag") {
    import graft.operators.Dedup
    val corpus0 = Seq((0L, "a b c d e f")).toDF("doc_id", "text")   // index seed
    val corpusApp = Seq((2L, "p q r s t u")).toDF("doc_id", "text") // appended later
    val dir = java.nio.file.Files.createTempDirectory("gram_idx").toString
    Dedup.writeGramIndex(corpus0, "doc_id", "text", n = 3, dir)
    Dedup.appendGramIndex(spark, dir, corpusApp, "doc_id", "text")
    // re-appending the SAME docs adds nothing (anti-join keeps it lean)
    val sizeBefore = spark.read.parquet(s"$dir/grams").count()
    Dedup.appendGramIndex(spark, dir, corpus0.unionAll(corpusApp), "doc_id", "text")
    assert(spark.read.parquet(s"$dir/grams").count() === sizeBefore)
    val batch = Seq(
      (11L, "x a b c d y"),       // starts 1,2 hit the SEED half
      (13L, "z p q r s w"),       // start 1 hits the APPENDED half
      (15L, "m n o k m n o k"),   // repeats within the batch only: no flag
      (17L, "q r")                // too short, still reported
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDuplicatedSpans(spark, dir, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(got(11L) === ((6, 2L, 4L, 1)))
    // starts 1 ("p q r") AND 2 ("q r s") hit the appended half:
    // tokens {1,2,3,4} covered
    assert(got(13L) === ((6, 2L, 4L, 1)), "appended grams are probed too")
    assert(got(15L) === ((8, 0L, 0L, -1)), "corpus-unknown batch repeats don't flag")
    assert(got(17L) === ((2, 0L, 0L, -1)))
  }

  test("D114 CDC: chunks tile the doc, a shifted copy shares all but the head chunk, partition-invariant") {
    import graft.operators.Dedup
    val words = (0 until 200).map(i => s"w${(i * 37) % 50}")
    val a = words.mkString(" ")
    val b = "zzz yyy xxx " + a // 3 injected tokens: every fixed-width chunk would shift
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text", w = 3, modulus = 16)
      .collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc(1L).map(_.getLong(3)).sum === 200L, "chunk lengths tile doc 1")
    assert(byDoc(2L).map(_.getLong(3)).sum === 203L, "chunk lengths tile doc 2")
    val h1 = byDoc(1L).map(_.getString(4)).toSet
    val h2 = byDoc(2L).map(_.getString(4)).toSet
    assert(h1.size >= 5, s"200 tokens at ~1/16 boundary rate chunk up (got ${h1.size})")
    // content-defined: once past the injected prefix the boundary
    // stream realigns, so every doc-1 chunk except the head re-occurs
    assert((h1 intersect h2).size >= h1.size - 1,
      s"shared ${(h1 intersect h2).size} of ${h1.size}")
    val cen = Dedup.cdcDuplicateCensus(docs, "doc_id", "text", 3, 16).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(cen(1L)._2 >= (h1.size - 1).toLong, "census flags the shared chunks")
    val again = Dedup.cdcDuplicateCensus(docs.repartition(3), "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(again === cen)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Brute-force winnowing reference (Schleimer et al. '03): per
    * window the min hash, ties to the rightmost position, distinct.
    */
  private def winnowRef(text: String, k: Int, w: Int): Seq[(Int, String)] = {
    val toks = text.split(" ")
    val L = toks.length - k + 1
    val hs = (0 until math.max(L, 0)).map(i => md5hex(toks.slice(i, i + k).mkString(" ")))
    (0 to L - w).map { j =>
      val win = j until j + w
      val m = win.map(hs).min
      val p = win.filter(hs(_) == m).max
      (p, hs(p))
    }.distinct.sortBy(_._1)
  }

  test("winnow equals the brute-force reference on random docs, any partitioning") {
    val rng = new scala.util.Random(42)
    val vocab = Seq("a", "b", "c", "d", "e") // tiny vocab forces repeated grams -> hash ties
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until (2 + rng.nextInt(30))).map(_ => vocab(rng.nextInt(5))).mkString(" ")))
    val expected = docs.map { case (id, text) =>
      val picks = winnowRef(text, 4, 4)
      val nTok = text.split(" ").length
      if (picks.isEmpty) (id, nTok, 0L, -1, -1, "")
      else (id, nTok, picks.size.toLong, picks.head._1, picks.last._1,
        md5hex(picks.map(_._2).mkString(",")))
    }.toSet
    for (parts <- Seq(1, 7)) {
      val got = graft.operators.Dedup.winnow(
          docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text", k = 4, w = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getInt(3), r.getInt(4), r.getString(5))).toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  test("winnow: rightmost tie-break, coverage guarantee, and the short-doc rule") {
    // All grams of an all-identical-token doc hash equal, so EVERY
    // window's rightmost-tie pick is its last position: picks must be
    // exactly {w-1 .. L-1} — the tie rule checked without any hashing.
    val docs = Seq(
      (0L, Seq.fill(10)("x").mkString(" ")), // L = 7 grams, picks 3..6
      (1L, "a b c d e f"),                   // L = 3 < w: no full window
      (2L, "")                               // degenerate
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.winnow(docs, "doc_id", "text", k = 4, w = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    val gh = md5hex(Seq.fill(4)("x").mkString(" "))
    assert(got(0L) === ((10, 4L, 3, 6, md5hex(Seq.fill(4)(gh).mkString(",")))))
    assert(got(1L) === ((6, 0L, -1, -1, "")))
    assert(got(2L) === ((1, 0L, -1, -1, "")))
    // Coverage guarantee on the reference rule: every full window of a
    // random doc contains at least one selected position.
    val rng = new scala.util.Random(7)
    val text = (0 until 60).map(_ => ('a' + rng.nextInt(3)).toChar.toString).mkString(" ")
    val picks = winnowRef(text, 4, 4).map(_._1).toSet
    val L = text.split(" ").length - 3
    for (j <- 0 to L - 4)
      assert((j until j + 4).exists(picks), s"window $j uncovered")
  }

  test("removeDuplicatedSpans: canonical keeps one copy, others cut, partition-invariant") {
    val docs = Seq(
      (0L, "a b c d e f"),       // canonical holder of the a..f trigrams
      (1L, "x a b c d y"),       // loses tokens under "a b c"/"b c d"
      (2L, "z z z"),             // unique gram, untouched
      (3L, "q r"),               // too short for a trigram, untouched
      (4L, "a b c d e f"),       // exact copy of d0: fully cut
      (5L, "m n o p m n o p")    // within-doc repeat only: untouched
    ).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.removeDuplicatedSpans(df, "doc_id", "text", n = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    val got = run(docs)
    // d0 is canonical for all its grams (lowest doc_id): nothing removed
    assert(got(0L) === ((6, 0L, "a b c d e f")))
    // d1's starts 1,2 ("a b c", "b c d") are non-canonical: tokens 1..4 cut
    assert(got(1L) === ((6, 4L, "x y")))
    assert(got(2L) === ((3, 0L, "z z z")))
    assert(got(3L) === ((2, 0L, "q r")))
    // d4 duplicates every d0 gram: all 6 tokens under starts 0..3 cut
    assert(got(4L) === ((6, 6L, "")))
    // cross-document criterion: within-doc repeats never removed
    assert(got(5L) === ((8, 0L, "m n o p m n o p")))
    assert(run(docs.repartition(5)) === got)
  }

  test("span dedup has no gram-start cap: duplicates past position 255 detected and cut") {
    // Two 400-token docs sharing ONLY a 5-gram at starts 310 (d0) and
    // 350 (d1). A 255-capped start series (the r9 oracle defect) would
    // see zero duplicates; the engine — and since r10 the oracle's
    // LATERAL unnest series — must flag exactly that span.
    val shared = (0 until 5).map(i => s"dup$i").mkString(" ")
    def doc(prefix: String, at: Int) =
      ((0 until at).map(i => s"$prefix$i") ++ Seq(shared) ++
        (at + 5 until 400).map(i => s"$prefix$i")).mkString(" ")
    val docs = Seq((0L, doc("a", 310)), (1L, doc("b", 350))).toDF("doc_id", "text")
    val spans = graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(spans(0L) === ((400, 1L, 5L, 310)))
    assert(spans(1L) === ((400, 1L, 5L, 350)))
    val removed = graft.operators.Dedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(removed(0L)._1 === 0L)  // lowest doc_id holds the canonical copy
    assert(removed(1L)._1 === 5L)  // d1's occurrence at 350 cut
    assert(removed(1L)._2 === doc("b", 350).split(" ").patch(350, Nil, 5).mkString(" "))
  }

  test("sourceOverlap: hand-computed pair matrix, containment, partition-invariant") {
    // 2-gram shingles: A0 {a b, b c}; A1 {b c, c d}; B0 {b c, c d};
    // C0 {x y}. Distinct per source: A {a b, b c, c d} (3), B {b c,
    // c d} (2), C {x y} (1). Shared: A∩B = {b c, c d} -> 2; C shares
    // nothing -> no row. containment(A,B) = floor(1e6*2/min(3,2)).
    val docs = Seq(
      (0L, "a b c", "A"), (1L, "b c d", "A"),
      (2L, "b c d", "B"), (3L, "x y", "C")
    ).toDF("doc_id", "text", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.CorpusStats.sourceOverlap(df, "text", "source", 2)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val got = run(docs)
    assert(got.size === 1)
    assert(got(("A", "B")) === ((2L, 3L, 2L, 1000000L)))
    assert(run(docs.repartition(5)) === got)
  }

  test("curriculumOrder: hand-worked interleave, ranks bijective, partition-invariant") {
    // scores 10,20,30,40,50 -> ranks 1..5; T=2: tier0 = ranks 1-3,
    // tier1 = ranks 4-5 (ceil(1*5/2)=3); keys: r1->0 r2->2 r3->4
    // r4->1 r5->3; sorted by key the tiers alternate 0,1,0,1,0
    val docs = Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L), (4L, 50L))
      .toDF("doc_id", "q")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Prep.curriculumOrder(df, "doc_id", "q", nTiers = 2,
          bucketWidth = 16)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val got = run(docs)
    assert(got(0L) === ((1L, 0L, 0L, 0L)))
    assert(got(1L) === ((2L, 0L, 1L, 2L)))
    assert(got(2L) === ((3L, 0L, 2L, 4L)))
    assert(got(3L) === ((4L, 1L, 0L, 1L)))
    assert(got(4L) === ((5L, 1L, 1L, 3L)))
    // keys are a bijection onto a valid ordering and partitioning-stable
    assert(got.values.map(_._4).toSeq.sorted === Seq(0L, 1L, 2L, 3L, 4L))
    assert(run(docs.repartition(4)) === got)
  }

  test("weightedSample: max weight always kept, zero never, thresholds exact, partition-invariant") {
    val g = 1L << 20
    val docs = Seq((0L, 0L), (1L, 50L), (2L, 100L), (3L, 25L))
      .toDF("doc_id", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Prep.weightedSample(df, "doc_id", "w", seed = 5)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val got = run(docs)
    assert(got(0L) === ((0L, 0L, false)))          // zero weight: never kept
    assert(got(2L)._2 === g)                       // max weight: threshold = g
    assert(got(2L)._3 === true)                    // ... so always kept
    assert(got(1L)._2 === g / 2)                   // 50*g div 100
    assert(got(3L)._2 === g / 4)
    assert(run(docs.repartition(3)) === got)
  }

  test("gramInt8: hand-computed triangle, partition-invariant with empty partitions") {
    // quantized: [2,0]->[127,0]; [0,2]->[0,127]; [1,1]->[127,127]
    // G(0,0) = 127^2*2 = 32258; G(0,1) = 16129; G(1,1) = 32258
    val emb = Seq((1L, Seq(2f, 0f)), (2L, Seq(0f, 2f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Linalg.gramInt8(df, "vec_id", "embedding")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = run(emb)
    assert(got === Map((0, 0) -> 32258L, (0, 1) -> 16129L, (1, 1) -> 32258L))
    assert(run(emb.repartition(8)) === got)
  }

  test("powerIteration: hand-worked rounds on a diagonal-ish Gram, converges to dominant axis") {
    import spark.implicits._
    // G = [[4, 0], [0, 1]] (upper triangle rows): dominant axis = dim 0.
    // v0 = (S, S); w1 = (4S, S) -> v1 = (S, S/4); w2 = (4S, S/4) ->
    // v2 = (S, S/16)
    val S = 10000L
    val g = Seq((0, 0, 4L), (0, 1, 0L), (1, 1, 1L)).toDF("i", "j", "s")
    val v2 = graft.operators.Linalg.powerIteration(g, dim = 2, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(v2 === Map(0 -> S, 1 -> S / 16))
    // off-diagonal coupling uses the SYMMETRIC expansion: G=[[0,2],[2,0]]
    // swaps mass every round but renorm keeps both at S
    val g2 = Seq((0, 0, 0L), (0, 1, 2L), (1, 1, 0L)).toDF("i", "j", "s")
    val w = graft.operators.Linalg.powerIteration(g2, dim = 2, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w === Map(0 -> S, 1 -> S), "symmetric expansion feeds both directions")
  }

  test("sortedNeighborhoodPairs: finds late-edit near-dups, misses first-word edits (the stated trade)") {
    // clones differing only in the LAST word sort adjacent — found —
    // while the same edit in the FIRST word sorts them apart when
    // enough other docs sit between (window 1 here forces it).
    val docs = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta last1"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta last2"),
      (10L, "astart beta gamma delta epsilon zeta eta theta iota"),
      (11L, "zstart beta gamma delta epsilon zeta eta theta iota")) ++
      (20L to 40L).map(i => (i, s"w$i filler body ${"pad " * 6}tail")))
      .toDF("doc_id", "text")
    def pairs(w: Int) = graft.operators.Dedup
      .sortedNeighborhoodPairs(docs, "doc_id", "text", window = w, n = 3,
        tNum = 1, tDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w1 = pairs(1)
    assert(w1.contains((1L, 2L)), "late-edit clones sort adjacent")
    assert(!w1.contains((10L, 11L)),
      "first-word edit sorts apart at window 1 - LSH territory, by design")
    // partition invariance
    val again = graft.operators.Dedup
      .sortedNeighborhoodPairs(docs.repartition(5), "doc_id", "text", 1, 3, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === w1)
  }

  test("greedyCoverage: marginal gain beats size, ties to min id, exhaustion stops") {
    // doc 1 covers shingles A∪B (8 3-grams); docs 2 and 3 each cover
    // a DISJOINT new region (4 each); doc 4 duplicates doc 1, so
    // after round 1 it contributes NOTHING — greedy must pick 1 then
    // {2,3}, and once coverage is exhausted round 4 emits NO row
    // (a zero-gain doc has no surviving index rows at all).
    val a = "a1 a2 a3 a4 a5"          // 3 grams
    val b = "b1 b2 b3 b4 b5"          // 3 grams
    val c = "c1 c2 c3 c4 c5 c6"       // 4 grams
    val d = "d1 d2 d3 d4 d5 d6"       // 4 grams
    val docs = Seq(
      (1L, s"$a $b"), (2L, c), (3L, d), (4L, s"$a $b"))
      .toDF("doc_id", "text")
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.Dedup.greedyCoverage(
          docs.repartition(parts), "doc_id", "text", n = 3, k = 4)
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got(1)._1 === 1L, s"parts=$parts")
      assert(got(1)._2 === 8L, "10 words -> 8 trigrams")
      assert(Set(got(2)._1, got(3)._1) === Set(2L, 3L), "disjoint regions next")
      assert(got(2)._2 === 4L && got(3)._2 === 4L)
      assert(!got.contains(4), "exhausted coverage: round 4 emits no row")
    }
  }

  test("bagDedup: permutations collapse, canonicalDedup keeps them apart, multiset-sensitive") {
    val docs = Seq(
      (5L, "alpha beta gamma"), (2L, "gamma alpha beta"),   // permutation
      (3L, "Alpha, beta gamma!"),                           // canon-equal to 5
      (7L, "alpha alpha beta gamma"),                       // different MULTISET
      (9L, "delta"))
      .toDF("doc_id", "text")
    val bag = graft.operators.Dedup.bagDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // {2,3,5} share one bag (survivor 2); 7 and 9 alone
    assert(bag === Map(2L -> 3L, 7L -> 1L, 9L -> 1L))
    // order-preserving canonical dedup does NOT merge the permutation
    val canon = graft.operators.Dedup.canonicalDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(canon(2L) === 1L && canon(3L) === 2L, "canonical keeps word order")
  }

  test("canonicalDedup: case/punct/space-blind groups, survivor = min id") {
    val docs = Seq(
      (10L, "Hello,  World!"), (3L, "hello world"), (7L, "hello world."),
      (1L, "different text")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.canonicalDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getInt(3)))).toMap
    // "hello world" group: survivor 3, copies 3, canon length 11
    assert(got(3L) === ((3L, 11)))
    assert(got(1L) === ((1L, 14)))
    assert(got.size === 2)
  }

  test("paddingAudit: hand-computed buckets and waste, partition-invariant") {
    // n_tok: 3, 5, 17, 20 with width 16 -> bucket 0 {3,5}, bucket 1 {17,20}
    val docs = Seq("a b c", "a b c d e", ("x " * 16).trim + " y",
      ("x " * 20).trim).toDF("text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Packing.paddingAudit(df, "text", 16)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))).toMap
    val got = run(docs)
    assert(got(0L) === ((2L, 8L, 5, 2L)))   // 2*5 - 8
    assert(got(1L) === ((2L, 37L, 20, 3L))) // 2*20 - 37
    assert(run(docs.repartition(4)) === got)
  }

  test("zorder: hand-computed Morton key, zone-map locality on BOTH columns") {
    import org.apache.spark.sql.functions.{col, lit}
    // a=5 (101b), b=3 (011b), bits=3: positions a->0,2,4 b->1,3,5
    // z = 1 (a0) + 2 (b0) + 0 (a1) + 8 (b1) + 16 (a2) + 0 (b2) = 27
    val one = Seq((5L, 3L)).toDF("a", "b")
      .select(graft.operators.Prep.zorderKey(col("a"), col("b"), 3).as("z"))
    assert(one.head.getLong(0) === 27L)
    // layout audit: bin fixes the top 4 bits of BOTH columns, so every
    // bin's zone-map range is < 2^12 in a AND in b — the two-sided
    // pruning a single-column sort cannot give
    val rows = Seq.tabulate(4000)(i => (i.toLong * 13 % 60000, i.toLong * 7 % 60000))
      .toDF("a", "b")
    val audit = graft.operators.Prep.zorderLayout(rows, "a", "b", 16, 24).collect()
    assert(audit.nonEmpty)
    for (r <- audit) {
      assert(r.getLong(3) - r.getLong(2) < 4096, r) // max_a - min_a
      assert(r.getLong(5) - r.getLong(4) < 4096, r) // max_b - min_b
    }
    val again = graft.operators.Prep.zorderLayout(rows.repartition(7), "a", "b", 16, 24)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(audit.map(r => r.getLong(0) -> r.toSeq).toMap === again)
  }

  test("seedPosteriorScore: hand-computed posteriors, threshold, partition-invariant") {
    val docs = Seq(
      (0L, "a a b", true),   // seed
      (1L, "a c", true),     // seed
      (2L, "b c c", false),
      (3L, "", false)        // empty text: zero tokens, pred false
    ).toDF("doc_id", "text", "seed")
    // counts: a -> cpos=3 cneg=0; b -> cpos=1 cneg=1; c -> cpos=1 cneg=2
    // s(a) = floor(4e6/5)   = 800000
    // s(b) = floor(2e6/4)   = 500000
    // s(c) = floor(2e6/5)   = 400000
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Classify.seedPosteriorScore(df, "doc_id", "text",
          org.apache.spark.sql.functions.col("seed"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val got = run(docs)
    assert(got(0L) === ((3L, 2100000L, true)))   // 800000*2 + 500000
    assert(got(1L) === ((2L, 1200000L, true)))   // 800000 + 400000
    assert(got(2L) === ((3L, 1300000L, false)))  // 500000 + 400000*2 < 1.5e6
    assert(got(3L) === ((0L, 0L, false)))
    assert(run(docs.repartition(5)) === got)
  }
}
