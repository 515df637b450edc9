package graft

import graft.operators.{Relevance, TextIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D55 — searching through the persisted inverted index must equal
  * the from-scratch integer-exact BM25 bit-for-bit, while reading
  * ONLY the buckets the query terms hash to.
  */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("join", "scan", "window")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("indexed search equals from-scratch BM25 saturation exactly") {
    val docs = Tables(spark, sf, "documents")
    val idx = java.nio.file.Files.createTempDirectory("graft_ti_spec").toString
    TextIndex.writeIndex(docs, "doc_id", "text", idx)
    val scratch = rows(Relevance.bm25SaturationExact(docs, "doc_id", "text", terms))
    val indexed = rows(TextIndex.searchSaturationExact(spark, idx, terms))
    assert(scratch.nonEmpty)
    assert(indexed === scratch)
  }

  test("the probe reads only the query terms' buckets") {
    val docs = Tables(spark, sf, "documents")
    val idx = java.nio.file.Files.createTempDirectory("graft_ti_spec2").toString
    TextIndex.writeIndex(docs, "doc_id", "text", idx, nBuckets = 64)
    val nTermBuckets = spark.range(1).select(
        terms.zipWithIndex.map { case (t, i) =>
          pmod(xxhash64(lit(t)), lit(64)).cast("int").as(s"b$i") }: _*)
      .head().toSeq.distinct.length
    // the probe's aggregate is AQE-wrapped; assert on a bare read with
    // the probe's exact filter shape (the IvfIndexSpec technique)
    val buckets = spark.range(1).select(
        terms.zipWithIndex.map { case (t, i) =>
          pmod(xxhash64(lit(t)), lit(64)).cast("int").as(s"b$i") }: _*)
      .head().toSeq.map(_.asInstanceOf[Int]).distinct
    val bare = spark.read.parquet(s"$idx/postings")
      .filter(col("bucket").isin(buckets: _*) && col("w").isin(terms: _*))
    bare.collect()
    val scan = bare.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    assert(selected === nTermBuckets,
      s"probe must read $nTermBuckets of 64 buckets, read $selected")
    assert(selected < 64)
  }

  test("append indexes only the batch, search covers the union") {
    val docs = Tables(spark, sf, "documents")
    val idx = java.nio.file.Files.createTempDirectory("graft_ti_spec_app").toString
    TextIndex.writeIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idx)
    val beforeFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$idx/postings"))
      .iterator()
    import scala.jdk.CollectionConverters._
    val before = beforeFiles.asScala.map(_.toString)
      .filter(_.endsWith(".parquet")).toSet
    TextIndex.appendIndex(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx)
    val after = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$idx/postings"))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toSet
    assert(before.subsetOf(after), "append must not rewrite existing postings")
    val scratch = rows(Relevance.bm25SaturationExact(docs, "doc_id", "text", terms))
    assert(rows(TextIndex.searchSaturationExact(spark, idx, terms)) === scratch)
  }

  test("index content is partition-invariant") {
    val docs = Tables(spark, sf, "documents")
    val a = java.nio.file.Files.createTempDirectory("graft_ti_spec3a").toString
    val b = java.nio.file.Files.createTempDirectory("graft_ti_spec3b").toString
    TextIndex.writeIndex(docs, "doc_id", "text", a)
    TextIndex.writeIndex(docs.repartition(13), "doc_id", "text", b)
    val pa = spark.read.parquet(s"$a/postings")
      .collect().map(_.toSeq).toSet
    val pb = spark.read.parquet(s"$b/postings")
      .collect().map(_.toSeq).toSet
    assert(pa === pb)
  }
}
