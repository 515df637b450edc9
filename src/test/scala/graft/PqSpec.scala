package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization index: hand-verifiable ADC arithmetic, code
  * alphabet bounds, tie determinism, partition invariance, and the
  * reconstruction contract (when corpus points ARE codebook centroids,
  * PQ search is exact).
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_pq_$tag").toString

  /** 8-dim corpus of 2 well-separated clusters around ±c so a tiny
    * trained codebook must place subspace centroids near each cluster.
    */
  private def clusteredVecs(n: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val base = if (i % 2 == 0) 0.4f else -0.4f
      (i.toLong, Seq.fill(8)(base + rng.nextFloat() * 0.02f))
    }
  }

  test("codes stay inside [0, ksub) and every row is encoded") {
    val dir = freshDir("alphabet")
    val df = clusteredVecs(64, 3L).toDF("vec_id", "embedding")
    Pq.writeIndex(df, "vec_id", "embedding", m = 4, ksub = 4, dir = dir)
    val codes = spark.read.parquet(s"$dir/codes").collect()
    assert(codes.length === 64)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === 4)
      assert(cs.forall(c => c >= 0 && c < 4), s"code out of range: $cs")
    }
    val cb = spark.read.parquet(s"$dir/codebook").collect()
    assert(cb.length === 4 * 4)
    assert(cb.forall(_.getSeq[Long](2).length === 2)) // dsub = 8/4
  }

  test("adist equals the hand-computed sum of per-subspace table lookups") {
    val dir = freshDir("adc")
    val df = clusteredVecs(32, 7L).toDF("vec_id", "embedding")
    Pq.writeIndex(df, "vec_id", "embedding", m = 4, ksub = 4, dir = dir)
    // reload the engine's own model + codes and recompute one query's
    // distances with independent scalar code
    val cb = spark.read.parquet(s"$dir/codebook").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2).toArray).toMap
    val codes = spark.read.parquet(s"$dir/codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val vecs = clusteredVecs(32, 7L).toMap
    val qv = vecs(5L).map(x => math.floor(x.toDouble * 256d).toLong).toArray
    val expected = codes.collect { case (cid, cs) if cid != 5L =>
      val d = (0 until 4).map { s =>
        val ctr = cb((s, cs(s)))
        (0 until 2).map { j =>
          val t = qv(s * 2 + j) - ctr(j)
          t * t
        }.sum
      }.sum
      cid -> d
    }
    val got = Pq.search(spark, dir,
        df.filter(col("vec_id") === 5L), "vec_id", "embedding", k = 31)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("ranking ties break to the lowest cid and k bounds the output") {
    val dir = freshDir("ties")
    // identical vectors -> identical codes -> identical adist: rank
    // order must be cid ascending
    val df = (0L until 10L).map(i => (i, Seq.fill(8)(0.25f))).toDF("vec_id", "embedding")
    Pq.writeIndex(df, "vec_id", "embedding", m = 4, ksub = 2, dir = dir)
    val got = Pq.search(spark, dir, df.filter(col("vec_id") === 9L),
        "vec_id", "embedding", k = 4)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((0L, 1), (1L, 2), (2L, 3), (3L, 4)))
  }

  test("search is invariant to corpus partitioning") {
    val base = clusteredVecs(64, 11L).toDF("vec_id", "embedding")
    def run(parts: Int): Set[(Long, Long, Long, Int)] = {
      val dir = freshDir(s"parts$parts")
      Pq.writeIndex(base.repartition(parts), "vec_id", "embedding",
        m = 4, ksub = 4, dir = dir)
      Pq.search(spark, dir, base.filter(col("vec_id") < 3), "vec_id",
          "embedding", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    }
    assert(run(1) === run(13))
  }

  test("IVF-PQ: probe reads only probed cell partitions; residual ADC tracks the true cluster") {
    val dir = freshDir("ivfpq")
    val df = clusteredVecs(256, 17L).toDF("vec_id", "embedding")
    Pq.writeIvfPqIndex(df, "vec_id", "embedding", nLists = 4, m = 4, ksub = 4, dir = dir)
    val res = Pq.searchIvfPq(spark, dir, df.filter(col("vec_id") < 4),
      "vec_id", "embedding", k = 5, nProbe = 2)
    // the cell restriction is a partition filter on the code table
    val planStr = res.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [cell"),
      s"cell IN (...) must be a partition filter, plan was:\n$planStr")
    // two well-separated clusters: every neighbor from the query's own
    res.collect().foreach { r =>
      assert(r.getLong(0) % 2 === r.getLong(1) % 2,
        s"query ${r.getLong(0)} matched the wrong cluster via ${r.getLong(1)}")
    }
    // a probe at 2 of 4 cells lists only the probed directories
    val probed = spark.read.parquet(s"$dir/codes").filter(col("cell").isin(0, 1))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    assert(selected === 2, s"probe must read only probed cells, read $selected of 4")
  }

  test("IVF-PQ codes: every row encoded, codes in range, cells in range") {
    val dir = freshDir("ivfpq2")
    val df = clusteredVecs(64, 23L).toDF("vec_id", "embedding")
    Pq.writeIvfPqIndex(df, "vec_id", "embedding", nLists = 4, m = 4, ksub = 4, dir = dir)
    val codes = spark.read.parquet(s"$dir/codes").collect()
    assert(codes.length === 64)
    codes.foreach { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      assert(cs.length === 4 && cs.forall(c => c >= 0 && c < 4))
      val cell = r.getInt(r.fieldIndex("cell"))
      assert(cell >= 0 && cell < 4)
    }
  }

  test("PQ search finds the true cluster when corpus is well-separated") {
    // recall contract on clustered data: for every query, all top-5
    // neighbors come from the query's own cluster (ADC error is far
    // smaller than the inter-cluster gap)
    val dir = freshDir("recall")
    val df = clusteredVecs(128, 13L).toDF("vec_id", "embedding")
    Pq.writeIndex(df, "vec_id", "embedding", m = 4, ksub = 4, dir = dir)
    val got = Pq.search(spark, dir, df.filter(col("vec_id") < 4),
        "vec_id", "embedding", k = 5).collect()
    got.foreach { r =>
      assert(r.getLong(0) % 2 === r.getLong(1) % 2,
        s"query ${r.getLong(0)} matched the wrong cluster via ${r.getLong(1)}")
    }
  }

  test("searchRerank: exact-distance order, shortlist containment, exact-on-grid distances") {
    val dir = freshDir("rerank")
    val df = clusteredVecs(128, 17L).toDF("vec_id", "embedding")
    Pq.writeIndex(df, "vec_id", "embedding", m = 4, ksub = 4, dir = dir)
    val queries = df.filter(col("vec_id") < 3)
    val shortlist = Pq.search(spark, dir, queries, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Pq.searchRerank(spark, dir, queries, df, "vec_id", "embedding",
      k = 4, shortlist = 10).collect()
    assert(got.length === 3 * 4)
    // every re-ranked row came from the ADC shortlist
    got.foreach(r => assert(shortlist((r.getLong(0), r.getLong(1)))))
    // per query: edist non-decreasing in rk, and equal to the
    // hand-computed grid L2 against the raw vectors
    val vecs = df.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(x => math.floor(x * 256d).toLong).toArray).toMap
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getLong(2)).toSeq === sorted.map(_.getLong(2)).toSeq.sorted)
      sorted.foreach { r =>
        val (q, c) = (vecs(r.getLong(0)), vecs(r.getLong(1)))
        val d = q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        assert(r.getLong(2) === d, s"edist mismatch for ${r.getLong(0)}->${r.getLong(1)}")
      }
    }
  }

  test("recallAudit: k-bounded ground truth, integer recall accounting, hits agree with a hand-join") {
    val dir = freshDir("audit")
    val df = clusteredVecs(96, 23L).toDF("vec_id", "embedding")
    Pq.writeIndex(df, "vec_id", "embedding", m = 4, ksub = 4, dir = dir)
    val queries = df.filter(col("vec_id") < 4)
    val got = Pq.recallAudit(spark, dir, queries, df,
      "vec_id", "embedding", k = 5).collect()
    assert(got.length === 4)
    got.foreach { r =>
      assert(r.getLong(1) === 5L, "ground truth must have exactly k rows")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 5L)
      assert(r.getLong(3) === r.getLong(2) * 100 / 5)
    }
    // the audit's n_hit must equal a hand-join of exact-vs-ADC top-5
    // (recall itself is legitimately low here: with 4-bit-per-subspace
    // codes whole clusters collapse to identical codes, ADC ties break
    // to lowest cid, and within-cluster ORDER is lost — which is
    // precisely the information the audit exists to surface)
    val vecs = df.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(x => math.floor(x * 256d).toLong).toArray).toMap
    val adc = Pq.search(spark, dir, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val handHits = (0L until 4L).map { q =>
      val exactTop = vecs.keys.filter(_ != q).toSeq
        .map(c => (vecs(q).zip(vecs(c)).map { case (a, b) => (a - b) * (a - b) }.sum, c))
        .sorted.take(5).map(_._2)
      q -> exactTop.count(c => adc((q, c))).toLong
    }.toMap
    got.foreach(r => assert(r.getLong(2) === handHits(r.getLong(0)),
      s"n_hit mismatch for query ${r.getLong(0)}"))
  }

  test("recallAudit queryMod: the seeded sample equals the full audit on the drawn subset") {
    val dir = freshDir("auditsample")
    val df = clusteredVecs(96, 23L).toDF("vec_id", "embedding")
    Pq.writeIndex(df, "vec_id", "embedding", m = 4, ksub = 4, dir = dir)
    val pool = df.filter(col("vec_id") < 10)
    def rows(audit: org.apache.spark.sql.DataFrame) = audit.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val sampled = rows(Pq.recallAudit(spark, dir, pool, df,
      "vec_id", "embedding", k = 5, queryMod = 2))
    // the sampled run must equal a full audit over the manually-drawn
    // query subset — sampling changes which queries pay a corpus pass,
    // never the per-query answer
    val manual = pool.filter(
      graft.operators.Sampling.hashMod(42L, col("vec_id")) % 2 === 0)
    assert(sampled === rows(Pq.recallAudit(spark, dir, manual, df,
      "vec_id", "embedding", k = 5)))
    // pins the exact draw the q_ann_recall oracle replays in SQL
    assert(sampled.map(_._1) === Set(1L, 3L, 5L, 9L))
  }
}
