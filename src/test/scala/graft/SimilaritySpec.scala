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
}
