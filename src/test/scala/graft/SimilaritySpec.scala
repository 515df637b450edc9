package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN quality: high recall vs the exact brute-force top-k while
  * scanning only the probed cells.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  // NOTE: the synthetic embeddings are isotropic (labels don't predict
  // cosine neighbors; within-label cos ≈ cross-label ≈ 0), so true
  // top-k are random near-ties and partial-probe recall is inherently
  // bounded. The invariants that matter: full probe == exact search,
  // and partial probe still recovers most neighbors while scanning a
  // fraction of the corpus.
  test("knnIvf: full probe equals brute force; 4/16 probe keeps recall") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.knnBruteForce(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.knnIvf(emb, queries, "vec_id", "embedding", 3,
        nLists = 16, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
    val partial = Similarity.knnIvf(emb, queries, "vec_id", "embedding", 3,
        nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(partial).size.toDouble / exact.size
    info(f"recall@3 at 4/16 probes = $recall%.2f")
    assert(recall >= 0.55)
  }

  test("knnIvf is deterministic under the fixed seed") {
    val emb = Tables(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    def run() = Similarity.knnIvf(emb, queries, "vec_id", "embedding", 3, 16, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run() === run())
  }

  test("hardNegatives: ceiling excludes near-dups, ranks the band, reduces to kNN at ceiling 1+") {
    import spark.implicits._
    // anchor 0 at (1,0); id 1 is a near-clone (sim ~0.999 -> excluded
    // at ceiling 0.9), ids 2..4 progressively farther
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.999f, 0.03f)),
      (2L, Array(0.8f, 0.6f)), (3L, Array(0.2f, 0.98f)),
      (4L, Array(-1.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val anchors = vecs.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
    val banded = Similarity.hardNegatives(vecs, anchors, "vec_id", "embedding",
        k = 2, ceiling = 0.9)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(banded === Seq((2L, 1), (3L, 2)), s"got $banded") // 1 excluded, 4 beyond k
    // ceiling above any cosine -> identical ranking to knnBruteForce
    val all = Similarity.hardNegatives(vecs, anchors, "vec_id", "embedding",
        k = 4, ceiling = 2.0)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    val knn = Similarity.knnBruteForce(vecs, anchors, "vec_id", "embedding", 4)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(all === knn)
    // partition invariance
    val re = Similarity.hardNegatives(vecs.repartition(3), anchors,
        "vec_id", "embedding", k = 2, ceiling = 0.9)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(re === banded)
  }

  test("truncationRecallAudit queryMod: seeded sample equals the full audit on the drawn subset") {
    val emb = Tables(spark, sf, "embeddings")
    val pool = emb.filter(col("vec_id") < 10)
    def rows(a: org.apache.spark.sql.DataFrame) = a.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val sampled = rows(Similarity.truncationRecallAudit(emb, pool,
      "vec_id", "embedding", k = 5, dims = Seq(16, 32), queryMod = 2))
    // sampling selects which queries pay a corpus pass; per-query
    // recall must be untouched — and the draw is the exact md5 draw
    // the q_trunc_recall oracle replays in SQL
    val manual = pool.filter(
      graft.operators.Sampling.hashMod(42L, col("vec_id")) % 2 === 0)
    assert(sampled === rows(Similarity.truncationRecallAudit(emb, manual,
      "vec_id", "embedding", k = 5, dims = Seq(16, 32))))
    assert(sampled.map(_._1) === Set(1L, 3L, 5L, 9L))
  }
}
