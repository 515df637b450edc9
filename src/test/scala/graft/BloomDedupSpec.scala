package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D51 — the bloom prefilter must be invisible in results (exact
  * verification removes false positives; false negatives are
  * impossible by construction) while actually pruning the anti-join
  * input. These pin equality with the plain incremental path, the
  * no-false-negative guarantee, the prefilter's selectivity, and the
  * empty-corpus edge.
  */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables(spark, sf, "documents").select("doc_id", "lang", "text")

  test("bloomIncremental equals incremental bit-for-bit on testdata") {
    val corpus = Dedup.corpusHashIndex(docs.filter(col("doc_id") % 3 === 0), "text")
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val plain = Dedup.incremental(batch, corpus, "doc_id", "text")
      .select("doc_id", "content_hash").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val bloomed = Dedup.bloomIncremental(batch, corpus, "doc_id", "text")
      .select("doc_id", "content_hash").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(plain.nonEmpty)
    assert(bloomed === plain)
  }

  test("no false negatives: every corpus hash probes true") {
    val corpus = Dedup.corpusHashIndex(docs, "text").localCheckpoint()
    val bloom = Dedup.corpusBloom(corpus, expectedItems = 10000L).get
    val misses = corpus
      .filter(!Dedup.mightContainBloom(bloom, col("content_hash"))).count()
    assert(misses === 0L)
  }

  test("prefilter prunes: most non-corpus hashes probe false") {
    val corpus = Dedup.corpusHashIndex(docs.filter(col("doc_id") % 3 === 0), "text")
    val bloom = Dedup.corpusBloom(corpus, expectedItems = 10000L).get
    // distinct batch-only hashes; dup rate across thirds is low, so
    // nearly all of these are absent from the corpus
    val batchHashes = Dedup.corpusHashIndex(docs.filter(col("doc_id") % 3 =!= 0), "text")
      .join(corpus.select(col("content_hash").as("__c")),
        col("content_hash") === col("__c"), "left_anti")
      .localCheckpoint()
    val total = batchHashes.count()
    val falsePos = batchHashes
      .filter(Dedup.mightContainBloom(bloom, col("content_hash"))).count()
    assert(total > 100, s"fixture too small: $total")
    // default fpp is 3%; 20% is an astronomically safe ceiling
    assert(falsePos.toDouble / total < 0.2, s"$falsePos of $total probed true")
  }

  test("empty corpus: everything fresh, keep-first within batch") {
    val corpus = Dedup.corpusHashIndex(docs.filter(lit(false)), "text")
    val batch = Seq((1L, "en", "a"), (2L, "en", "a"), (3L, "en", "b"))
      .toDF("doc_id", "lang", "text")
    val got = Dedup.bloomIncremental(batch, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }

  test("bloom bytes are deterministic for a given index") {
    val corpus = Dedup.corpusHashIndex(docs.filter(col("doc_id") % 3 === 0), "text")
    val a = Dedup.corpusBloom(corpus, 10000L).get
    val b = Dedup.corpusBloom(corpus.repartition(7), 10000L).get
    assert(java.util.Arrays.equals(a, b),
      "filter bytes must not depend on physical partitioning")
  }
}
