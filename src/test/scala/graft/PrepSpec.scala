package graft

import graft.operators.Prep
import org.scalatest.funsuite.AnyFunSuite

/** D29/D30 dataset-prep operators: the two-phase shuffle position must
  * equal a plain global row_number, splits must be a stable pure
  * projection, and chunk windows must align with token content.
  */
class PrepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two-phase shuffle positions equal the global row_number") {
    val docs = (0L until 500L).toDF("doc_id")
    val got = Prep.shuffleDeterministic(docs, "doc_id", seed = 7L)
      .select("doc_id", "shuffle_key", "pos").collect()
    // reference: plain sort by (key, id), 1-based index
    val expect = got.map(r => (r.getString(1), r.getLong(0)))
      .sorted.zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }.toMap
    got.foreach(r => assert(r.getLong(2) === expect(r.getLong(0)), s"doc ${r.getLong(0)}"))
    // positions are a permutation of 1..n
    assert(got.map(_.getLong(2)).sorted.toSeq === (1L to 500L))
    // deterministic under repartitioning
    val again = Prep.shuffleDeterministic(docs.repartition(7), "doc_id", 7L)
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(again(r.getLong(0)) === r.getLong(2)))
    // a different seed really is a different permutation
    val other = Prep.shuffleDeterministic(docs, "doc_id", 8L)
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.exists(r => other(r.getLong(0)) != r.getLong(2)))
  }

  test("split assignment is a stable projection with sane proportions") {
    val docs = (0L until 2000L).toDF("doc_id")
    val splits = Prep.splitAssign(docs, "doc_id", seed = 7L)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet === Set("train", "val", "test"))
    // 'e6'/'f3' prefixes ≈ 90/5/5; allow generous binomial slack
    assert(splits("train") > 1700 && splits("train") < 1890, splits)
    assert(splits("val") > 40 && splits("val") < 180, splits)
    assert(splits("test") > 40 && splits("test") < 180, splits)
    // membership never depends on the rest of the corpus
    val sub = Prep.splitAssign(docs.filter($"doc_id" < 100), "doc_id", 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = Prep.splitAssign(docs, "doc_id", 7L)
      .filter($"doc_id" < 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub === full)
  }

  test("clustered splits keep near-dup clusters whole and reduce to splitAssign on singletons") {
    val docs = (0L until 400L).toDF("doc_id")
    // pair graph: chains {0,1,2} and {10,350}, rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 350L)).toDF("d1", "d2")
    val got = Prep.splitAssignClustered(docs, "doc_id", pairs, seed = 7L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.size === 400)
    // every cluster member shares its cluster's id AND split
    assert(Seq(0L, 1L, 2L).map(got(_)).distinct.size === 1)
    assert(got(0L)._1 === 0L)
    assert(Seq(10L, 350L).map(got(_)).distinct.size === 1)
    assert(got(10L)._1 === 10L)
    // singletons: cluster id is the doc's own id and the split IS
    // plain splitAssign's answer
    val plain = Prep.splitAssign(docs, "doc_id", 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, (cid, sp)) =>
      if (!Set(0L, 1L, 2L, 10L, 350L).contains(id)) {
        assert(cid === id)
        assert(sp === plain(id))
      }
    }
    // the guarantee itself: no pair straddles a split boundary
    Seq((0L, 1L), (1L, 2L), (10L, 350L)).foreach { case (a, b) =>
      assert(got(a)._2 === got(b)._2, s"pair ($a,$b) straddles splits")
    }
    // partition invariance
    val again = Prep.splitAssignClustered(docs.repartition(7), "doc_id",
        pairs.repartition(3), seed = 7L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again === got)
  }

  test("chunk windows align with token content, including the ragged tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Prep.chunkDocs(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // n=10, stride 3: starts 0,3,6,9 -> lengths 4,4,4,1
    assert(chunks.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ===
      Seq((0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)))
    assert(chunks.map(r => (r.getString(4), r.getString(5))).toSeq ===
      Seq(("t1", "t4"), ("t4", "t7"), ("t7", "t10"), ("t10", "t10")))
    // single-token and empty docs chunk to exactly one window
    val tiny = Seq((1L, "only"), (2L, "")).toDF("doc_id", "text")
    val t = Prep.chunkDocs(tiny, "doc_id", "text", 4, 3).collect()
    assert(t.length === 2)
    assert(t.forall(r => r.getInt(1) === 0 && r.getInt(3) === 1))
  }

  test("int8 quantization: range, dequant error bound, zero vectors") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(2.0f, 1.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val rows = Prep.quantizeInt8(vecs, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Long](2)))).toMap
    // scale = max |x|; q = floor(x*127/scale)
    assert(rows(1L)._1 === 1.0)
    assert(rows(1L)._2 === Seq(63L, -127L, 31L))
    assert(rows(2L)._1 === 0.0 && rows(2L)._2 === Seq(0L, 0L, 0L))
    assert(rows(3L)._2 === Seq(127L, 63L, -127L))
    // every component within int8, and dequant error <= scale/127 + one
    // floor step
    for ((id, (scale, q)) <- rows; (qi, i) <- q.zipWithIndex) {
      assert(qi >= -128 && qi <= 127, s"vec $id comp $i")
      if (scale > 0) {
        val x = Map(1L -> Array(0.5, -1.0, 0.25), 3L -> Array(2.0, 1.0, -2.0))(id)(i)
        assert(math.abs(qi * scale / 127.0 - x) <= scale / 127.0 + 1e-12, s"vec $id comp $i")
      }
    }
  }

  test("signed random projection equals brute force, zero vectors to zeros, partition-invariant") {
    val rng = new scala.util.Random(3L)
    val emb = (0L until 40L).map(i => (i, Array.fill(8)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val signs = Prep.srpSigns(5L, 4, 8)
    val flat = signs.flatMap(_.toSeq).toSeq
    // ±1 only, and the matrix is not degenerate (both signs occur)
    assert(flat.forall(s => s == 1L || s == -1L))
    assert(flat.distinct.length === 2)
    // a different seed gives a different matrix
    assert(flat !== Prep.srpSigns(6L, 4, 8).flatMap(_.toSeq).toSeq)
    val got = Prep.projectSigned(emb, "vec_id", "embedding", outDim = 4, dim = 8, seed = 5L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    emb.collect().foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val scale = v.map(math.abs).max
      val q = if (scale == 0) v.map(_ => 0L)
              else v.map(x => math.floor(x * 127d / scale).toLong)
      val expect = (0 until 4).map(j => (0 until 8).map(i => signs(j)(i) * q(i)).sum)
      assert(got(r.getLong(0)) === expect, s"vec ${r.getLong(0)}")
      expect.foreach(p => assert(math.abs(p) <= 127L * 8))
    }
    // zero vector projects to zeros (scale-0 branch)
    val z = Prep.projectSigned(Seq((9L, Array.fill(8)(0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", 4, 8, 5L).collect()(0).getSeq[Long](1)
    assert(z.forall(_ == 0L))
    // pure function of the data: invariant under repartitioning
    val again = Prep.projectSigned(emb.repartition(7), "vec_id", "embedding", 4, 8, 5L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again === got)
  }

  test("shuffle plan: bucket-parallel window + broadcast offsets, no corpus-wide single partition") {
    val docs = (0L until 100L).toDF("doc_id")
    val plan = Prep.shuffleDeterministic(docs, "doc_id", 7L).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the big window partitions by the key bucket, offsets ride a broadcast
    assert(plan.contains("__bucket"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("quantileBuckets: equi-depth, monotone, ties to the lower bucket, no global window") {
    val df = (1L to 100L).map(i => (i, i * 3 % 97)).toDF("id", "v")
    val got = Prep.quantileBuckets(df, "id", "v", nBuckets = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length === 100)
    assert(got.forall(r => r._3 >= 1 && r._3 <= 4))
    // monotone in v
    val byV = got.sortBy(_._2)
    assert(byV.sliding(2).forall { case Array(a, b) => a._3 <= b._3 })
    // equi-depth: 100 rows over 4 buckets ≈ 25 each (discrete
    // boundaries on near-unique values keep it within ±2)
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.values.forall(s => s >= 23 && s <= 27), sizes.toString)
    // a value equal to a boundary lands in the LOWER bucket: the max
    // of bucket 1 is the 25th-percentile boundary itself
    val b1max = got.filter(_._3 == 1).map(_._2).max
    assert(got.filter(_._2 == b1max).forall(_._3 == 1))
    // plan: assignment is a broadcast join + projection, no window,
    // no single-partition exchange of the corpus
    val plan = Prep.quantileBuckets(df, "id", "v", 4).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("spanCorruption: spans in bounds, islands disjoint with real gaps, replayable") {
    val docs = (1L to 40L)
      .map(i => (i, (1 to 60).map(k => s"w$k").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = Prep.spanCorruption(docs, "doc_id", "text",
        ratePct = 20, spanLen = 5, seed = 7L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.nonEmpty)
    // every span inside its doc, positive length
    assert(spans.forall { case (_, n, _, s, l) => s >= 0 && l >= 1 && s + l <= n })
    // per doc: ordered span_idx from 0, spans strictly disjoint with
    // a gap (adjacent/overlapping candidates must have merged)
    spans.groupBy(_._1).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_._3)
      assert(ordered.map(_._3) === ordered.indices.map(_.toLong))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._4 > a._4 + a._5,
          s"islands touch: $a then $b — should have merged")
        case _ => ()
      }
    }
    // pure function of (data, params): identical on a reshuffled input
    val again = Prep.spanCorruption(docs.repartition(7), "doc_id", "text", 20, 5, 7L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(t => (t._1, t._3)) === spans.sortBy(t => (t._1, t._3)))
  }
}
