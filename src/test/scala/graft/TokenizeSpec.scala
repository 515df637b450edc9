package graft

import graft.operators.Tokenize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bpeMerges: hand-verified rounds, greedy adjacency, tiebreak, exhaustion") {
    // vocab: ab×3, abc×1, bbbb×1
    val docs = Seq((0L, "ab ab ab"), (1L, "abc"), (2L, "bbbb"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Tokenize.bpeMerges(df, "text", rounds = 5)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val got = run(docs)
    assert(got === Seq(
      (1, "a", "b", 4L),   // ab×3 + abc×1
      (2, "b", "b", 3L),   // bbbb's 3 adjacent pairs
      // GREEDY adjacency: round 2 must turn bbbb into (bb, bb) — a
      // representation that loses the shared delimiter would yield
      // (bb, b, b) and a (bb, b) pair here instead
      (3, "ab", "c", 1L),  // tie with (bb, bb) at 1; lex tiebreak picks ab
      (4, "bb", "bb", 1L)))
    // rounds=5 requested, but every word is a single symbol after 4
    // merges: the loop must stop rather than emit a phantom merge
    assert(got.length === 4)
    // pure function of the data: invariant under repartitioning
    assert(run(docs.repartition(5)) === got)
  }

  test("bpeMerges: null/empty text and single-char words contribute no pairs") {
    val docs = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "a b a b"),
      (3L, "xy")).toDF("doc_id", "text")
    val got = Tokenize.bpeMerges(docs, "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // only "xy" has an adjacent pair; a/b are single-symbol words
    assert(got === Seq((1, "x", "y", 1L)))
  }

  test("bpeEncode: hand-verified token counts, merge order matters, boundaries hold") {
    val docs = Seq((0L, "abab ab"), (1L, "b a"), (2L, "aabb")).toDF("doc_id", "text")
    // merges learned elsewhere: (a,b) then (ab,ab)
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val got = Tokenize.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // abab -> ab ab -> abab (1 tok); ab -> ab (1 tok)
    assert(got(0L) === ((2L, 2L)))
    // "b a" stays 2 single-char words: merges never cross a word boundary
    assert(got(1L) === ((2L, 2L)))
    // aabb -> a ab b (merge 1 hits the middle pair only) = 3 tokens
    assert(got(2L) === ((1L, 3L)))
    // applying merge 2 before merge 1 could never fire: order is the contract
    val swapped = Tokenize.bpeEncode(docs, "doc_id", "text", merges.reverse)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(swapped(0L) === 3L) // ab ab never forms, abab stays a+b merged only
  }

  test("bpeEncode plan: pure projection until the per-doc sum, UDF-free") {
    val docs = Seq((0L, "some words")).toDF("doc_id", "text")
    val plan = Tokenize.bpeEncode(docs, "doc_id", "text", Seq(("a", "b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan) // partial + final
  }

  test("bpe plans: vocab is the only corpus exchange; pair counting stays UDF-free") {
    val docs = Seq((0L, "some words here")).toDF("doc_id", "text")
    val vocabPlan = Tokenize.bpeVocab(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!vocabPlan.contains("ScalaUDF"), vocabPlan)
    val pairPlan = Tokenize.pairCounts(Tokenize.bpeVocab(docs, "text"))
      .queryExecution.executedPlan.toString
    assert(!pairPlan.contains("ScalaUDF"), pairPlan)
    // both aggregates partial-aggregate map-side (word count, pair count)
    assert("HashAggregate".r.findAllIn(pairPlan).size >= 2, pairPlan)
  }
}
