package graft

import graft.operators.Itemsets
import org.scalatest.funsuite.AnyFunSuite

/** Frequent-pair mining: hand-counted supports, the apriori prune, the
  * within-doc distinct, threshold boundary arithmetic, and partition
  * invariance.
  */
class ItemsetsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], iN: Int, iD: Int, pN: Int, pD: Int,
      parts: Int = 1): Set[(String, String, Long)] =
    Itemsets.frequentPairs(rows.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", iN, iD, pN, pD)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("hand-counted pairs on a 4-doc corpus") {
    // a: 4/4 docs, b: 3/4, c: 2/4, x: 1/4
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b x"), (4L, "a"))
    // item support 1/2: a, b, c qualify; x (1/4) pruned by pass 1
    // pair supports: (a,b)=3, (a,c)=2, (b,c)=2
    assert(run(docs, 1, 2, 1, 2) ===
      Set(("a", "b", 3L), ("a", "c", 2L), ("b", "c", 2L)))
    // pair support 3/4 keeps only (a,b)
    assert(run(docs, 1, 2, 3, 4) === Set(("a", "b", 3L)))
  }

  test("apriori prune: a pair of infrequent items never surfaces even if joint support passes") {
    // y and z always co-occur (2/4 docs = pair support 1/2) but each
    // has item support 2/4 < 3/4 -> pruned in pass 1
    val docs = Seq(
      (1L, "y z"), (2L, "y z"), (3L, "a"), (4L, "a"))
    assert(run(docs, 3, 4, 1, 2) === Set.empty)
  }

  test("repeated tokens inside a doc count once (basket = distinct set)") {
    val docs = Seq((1L, "a a a b b"), (2L, "a b"))
    assert(run(docs, 1, 1, 1, 1) === Set(("a", "b", 2L)))
  }

  test("threshold boundary is >= (exact rational, no float drift)") {
    // 3 docs, pair in exactly 2: 2*3 >= 3*2 holds at support 2/3
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "p r q r"))
    val got = run(docs, 1, 3, 2, 3)
    assert(got.contains(("p", "q", 3L)))
    assert(got.contains(("q", "r", 1L)) === false)
  }

  test("result is invariant to physical partitioning") {
    val rng = new scala.util.Random(5L)
    val vocab = Vector("t0", "t1", "t2", "t3", "t4", "t5", "t6", "t7")
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(6)(vocab(rng.nextInt(vocab.size))).mkString(" ")))
    assert(run(docs, 1, 4, 1, 4, parts = 1) === run(docs, 1, 4, 1, 4, parts = 11))
  }
}
