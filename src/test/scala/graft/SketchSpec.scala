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
}
