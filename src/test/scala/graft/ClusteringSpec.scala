package graft

import graft.operators.Clustering
import org.scalatest.funsuite.AnyFunSuite

/** D28 quantized k-means: hand-checkable geometry, the empty-cluster
  * rule, and determinism under repartitioning (the property the
  * integer quantization exists to provide).
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("separable geometry converges to the obvious clusters") {
    // two tight groups far apart, k=2, init = vecs of ids 0 and 1 (one
    // from each group by construction)
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(0.02f, 0.01f)), (3L, Array(0.98f, 1.01f)),
      (4L, Array(0.01f, 0.03f)), (5L, Array(1.02f, 0.99f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeansQuantized(vecs, "vec_id", "embedding",
      k = 2, iters = 2, dim = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(Set(0L, 2L, 4L).map(out) === Set(0))
    assert(Set(1L, 3L, 5L).map(out) === Set(1))
  }

  test("semanticDedup: within-cluster near-dups drop keep-lowest-id; across clusters survive") {
    import graft.operators.Dedup
    // group A near (1,0): 0 and 2 nearly parallel (near-dup), group B
    // near (0,1): 1 and 3 nearly parallel; A vs B orthogonal (sim ~0)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.99f, 0.01f)), (3L, Array(0.01f, 0.99f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 2, iters = 2, dim = 2, threshold = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id")).toSet
    // 2 drops against 0, 3 drops against 1; the lowest ids survive
    assert(out === Set(0L, 1L))
    // a threshold above every within-cluster sim keeps everything
    val all = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 2, iters = 2, dim = 2, threshold = 0.99999)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(all === Set(0L, 1L, 2L, 3L))
    // partition invariance: assignment and pair set are pure functions
    val again = Dedup.semanticDedup(vecs.repartition(3), "vec_id", "embedding",
        k = 2, iters = 2, dim = 2, threshold = 0.9)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(again === out)
  }

  test("E66 substrate: disjoint-slice stat partials merge to the one-shot Lloyd update; untouched clusters keep seed") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(0.04f, 0.02f)), (3L, Array(0.96f, 1.02f)),
      (4L, Array(0.02f, 0.06f)), (5L, Array(1.04f, 0.98f)))
      .toDF("vec_id", "embedding")
    val seed = Clustering.centroidsOf(vecs, "vec_id", "embedding",
      k = 2, iters = 0, dim = 2)
    assert(seed(0).toSeq === Seq(0L, 0L) && seed(1).toSeq === Seq(256L, 256L))
    val work = java.nio.file.Files.createTempDirectory("graft_centroid_stats")
    // two disjoint slices (the stream's micro-batches), one epoch each
    val ea = work.resolve("epoch_a").toString
    val eb = work.resolve("epoch_b").toString
    Clustering.centroidStatsPartial(vecs.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", seed, 2).write.parquet(ea)
    Clustering.centroidStatsPartial(vecs.filter($"vec_id" % 2 === 1),
      "vec_id", "embedding", seed, 2).write.parquet(eb)
    val oneShotDir = work.resolve("oneshot").toString
    Clustering.centroidStatsPartial(vecs, "vec_id", "embedding", seed, 2)
      .write.parquet(oneShotDir)
    def rows(dirs: Seq[String]) =
      Clustering.centroidRefineRows(spark, dirs, seed, 2)
        .orderBy("cluster", "i").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val merged = rows(Seq(ea, eb))
    // the additive identity: merged micro-batch partials == one shot
    assert(merged === rows(Seq(oneShotDir)))
    // hand-worked: cluster 0 = {0,2,4} with q = (0,0),(10,5),(5,15) →
    // Σ=(15,20), n=3, c=(5,6); cluster 1 = {1,3,5} with q =
    // (256,256),(245,261),(266,250) → Σ=(767,767), n=3, c=(255,255)
    assert(merged === Seq(
      (0, 1, 5L, 3L), (0, 2, 6L, 3L), (1, 1, 255L, 3L), (1, 2, 255L, 3L)))
    // no partials at all: every cluster keeps its seed at n = 0
    val none = rows(Seq.empty)
    assert(none === Seq(
      (0, 1, 0L, 0L), (0, 2, 0L, 0L), (1, 1, 256L, 0L), (1, 2, 256L, 0L)))
  }

  test("D136 churn audit: hand-worked flip — one point crosses clusters after a refresh") {
    // 1-D geometry engineered so exactly one point flips: seeds are
    // q=0 (id 0) and q=256 (id 1); q=110 joins cluster 0, q=130 and
    // q=250 join cluster 1. The refresh moves c0 to 55 (toward 130)
    // and c1 to 212 (away from it): 130 re-assigns to cluster 0 —
    // |130-55|² = 5625 < |130-212|² = 6724 — everyone else stays.
    val vecs = Seq(
      (0L, Array(0.0f)), (1L, Array(1.0f)),
      (2L, Array(0.43f)),   // floor(110.08) = 110
      (3L, Array(0.51f)),   // floor(130.56) = 130
      (4L, Array(0.977f)))  // floor(250.112) = 250
      .toDF("vec_id", "embedding")
    val before = Clustering.centroidsOf(vecs, "vec_id", "embedding",
      k = 2, iters = 0, dim = 1)
    val after = Clustering.centroidsOf(vecs, "vec_id", "embedding",
      k = 2, iters = 1, dim = 1)
    assert(before.map(_.toSeq).toSeq === Seq(Seq(0L), Seq(256L)))
    assert(after.map(_.toSeq).toSeq === Seq(Seq(55L), Seq(212L)))
    val churn = Clustering.centroidChurn(vecs, "vec_id", "embedding", before, after)
      .orderBy("from_cluster", "to_cluster").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(churn === Seq((0, 0, 2L), (1, 0, 1L), (1, 1, 2L)))
    // identical before/after centroids: the matrix is purely diagonal
    val still = Clustering.centroidChurn(vecs, "vec_id", "embedding", before, before)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(still.forall(t => t._1 == t._2) && still.map(_._3).sum === 5L)
  }

  test("an emptied cluster keeps its centroid instead of crashing") {
    // ids 0 and 1 are IDENTICAL: init c0 == c1 and ties break to the
    // lowest cluster, so cluster 1 gets no members in the first
    // assignment. With iters=0 that IS the output; with iters=2 the
    // run must survive the empty re-estimation (cluster 1 keeps the
    // stale centroid — and may legally re-acquire points once cluster
    // 0's centroid moves off it).
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)),
      (2L, Array(5.0f, 5.0f)), (3L, Array(0.1f, 0.1f)), (4L, Array(5.1f, 4.9f)))
      .toDF("vec_id", "embedding")
    val out0 = Clustering.kmeansQuantized(vecs, "vec_id", "embedding",
      k = 3, iters = 0, dim = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(!out0.values.toSet.contains(1), "ties break away from cluster 1")
    assert(out0(0L) === 0 && out0(2L) === 2)
    val out2 = Clustering.kmeansQuantized(vecs, "vec_id", "embedding",
      k = 3, iters = 2, dim = 2).collect()
    assert(out2.length === 5, "empty re-estimation must not crash or drop rows")
  }

  test("assignments are deterministic and partition-invariant") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Clustering.kmeansQuantized(emb, "vec_id", "embedding", 4, 2, 64)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    val b = Clustering.kmeansQuantized(emb.repartition(7), "vec_id", "embedding", 4, 2, 64)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(a === b)
    assert(a.values.toSet.size > 1, "multiple clusters in use")
  }

  test("nearest_centroid: ties -> lowest index, codegen == interpreted, ragged throws") {
    import graft.functions.NearestCentroid
    import org.apache.spark.sql.functions.{col, transform => atransform, floor => afloor}
    val cents = Array(Array(0L, 0L), Array(10L, 0L), Array(0L, 0L)) // c2 duplicates c0
    val df = Seq((0L, Seq(1L, 1L)), (1L, Seq(9L, 1L)), (2L, Seq(5L, 0L)))
      .toDF("vec_id", "q")
    val got = df.withColumn("cl", NearestCentroid.nearestCentroid(col("q"), cents))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cl")).toMap
    // (1,1): d0=2 d1=82 d2=2 -> tie c0/c2 -> 0; (9,1): d1=2 -> 1;
    // (5,0): d0=25 d1=25 d2=25 -> all tie -> 0
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 0))
    // interpreted eval agrees with the codegen'd result
    val expr = NearestCentroid(org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(9L, 1L), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)), cents)
    assert(expr.eval(null) === 1)
    val ragged = Seq((0L, Seq(1L, 2L, 3L))).toDF("vec_id", "q")
      .withColumn("cl", NearestCentroid.nearestCentroid(col("q"), cents))
    val ex = intercept[Exception](ragged.collect())
    assert(ex.getMessage != null)
  }

  test("large-k assignment stays a single projection (the k=256 scale path)") {
    // the old duplicated-distance-tree shape would blow the codegen
    // method-size limit around here; the single-loop NearestCentroid
    // must keep a big-k assignment correct and deterministic
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val k = 64
    val a = Clustering.kmeansQuantized(emb, "vec_id", "embedding", k, 1, 64)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    val b = Clustering.kmeansQuantized(emb.repartition(5), "vec_id", "embedding", k, 1, 64)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster")).toMap
    assert(a === b)
    assert(a.values.forall(c => c >= 0 && c < k))
    assert(a.values.toSet.size > k / 4, "most clusters in use at k=64")
  }

  test("centroid update divides per-dimension sums with truncation") {
    // one cluster after quantization: members q = (25,-52) and (76,25)
    // (floor of x*256); k=1 centroid after one iter = ((25+76)/2, (-52+25)/2)
    // = (50, -13): TRUNCATING division (-27/2 == -13), matching DuckDB's
    // BIGINT // BIGINT — floor semantics would give -14
    val vecs = Seq((0L, Array(0.1f, -0.2f)), (1L, Array(0.3f, 0.1f)))
      .toDF("vec_id", "embedding")
    val c = Clustering.centroidsOf(vecs, "vec_id", "embedding", k = 1, iters = 1, dim = 2)
    assert(c(0).toSeq === Seq((25L + 76L) / 2, (-52L + 25L) / 2))
  }

  test("kCenter: hand-worked farthest-point rounds on a line") {
    // quantized xs (scale 256): 0, 256, 1280, 512. Seed = id 0 (x=0).
    // Round 2: farthest is id 2 (x=1280, d=1280²).
    // Round 3: minds now {1: 256² to seed, 3: 512² to seed}; farthest
    // id 3 (512² = 262144). Round 4: id 1 (256² = 65536).
    val vecs = Seq(
      (0L, Array(0.0f)), (1L, Array(1.0f)), (2L, Array(5.0f)), (3L, Array(2.0f)))
      .toDF("vec_id", "embedding")
    val got = Clustering.kCenter(vecs, "vec_id", "embedding", k = 4)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1, 0L, 0L), (2, 2L, 1280L * 1280L),
      (3, 3L, 512L * 512L), (4, 1L, 256L * 256L)))
  }

  test("kCenter: argmax ties break to the lowest vec_id") {
    // ids 1 and 2 equidistant from the seed — round 2 must take id 1
    val vecs = Seq(
      (0L, Array(0.0f)), (1L, Array(1.0f)), (2L, Array(-1.0f)))
      .toDF("vec_id", "embedding")
    val got = Clustering.kCenter(vecs, "vec_id", "embedding", k = 2)
      .orderBy("round").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === Seq((1, 0L), (2, 1L)))
  }

  test("kCenter: fully covered corpus re-picks deterministically at dist 0") {
    // every vector identical: after the seed all minds are 0; the
    // contract is k rows with the smallest-id pick at dist 0 (the
    // oracle's ORDER BY mind DESC, vec_id LIMIT 1 does the same)
    val vecs = Seq((3L, Array(0.5f)), (7L, Array(0.5f)))
      .toDF("vec_id", "embedding")
    val got = Clustering.kCenter(vecs, "vec_id", "embedding", k = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1, 3L, 0L), (2, 3L, 0L), (3, 3L, 0L)))
  }

  test("kCenter is invariant to physical partitioning") {
    val rng = new scala.util.Random(19L)
    val vecs = (0L until 200L).map(i => (i, Array.fill(8)(rng.nextFloat())))
    def run(parts: Int) =
      Clustering.kCenter(vecs.toDF("vec_id", "embedding").repartition(parts),
          "vec_id", "embedding", k = 5)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) === run(17))
  }
}
