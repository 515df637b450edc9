package graft

import graft.operators.{AsOf, RangeJoin, Sessionize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case regression suite for the join/session operators — the
  * scenarios from the round-1 advisory: as-of row atomicity under
  * right-side nulls, range-join bucket math at >2^53 and invalid
  * intervals, sessionize on frames without the default tiebreaker.
  */
class JoinOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asOfJoin carries the latest right ROW atomically even when it holds nulls") {
    val left = Seq((1L, 25L, "L1")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, Option(100L), "a"),
      (1L, 20L, Option.empty[Long], "b") // latest match, value NULL
    ).toDF("k", "ts", "value", "aux")
    val out = AsOf.asOfJoin(left, right, "k", "ts",
      leftCols = Seq("tag"), rightCols = Seq("value", "aux"))
      .select("asof_value", "asof_aux").collect().head
    // the ts=20 row wins as a unit: null value + aux 'b'; mixing
    // value=100 from the older row with aux='b' would be wrong
    assert(out.isNullAt(0))
    assert(out.getString(1) === "b")
  }

  test("asOfJoin emits all-null asof columns when no right row precedes") {
    val left = Seq((1L, 5L, "early")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, Option(100L), "a")).toDF("k", "ts", "value", "aux")
    val out = AsOf.asOfJoin(left, right, "k", "ts", Seq("tag"), Seq("value", "aux"))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("asof_value")))
    assert(out.isNullAt(out.fieldIndex("asof_aux")))
  }

  test("asOfJoinForward picks the EARLIEST right row at or after, inclusive") {
    val left = Seq((1L, 20L, "L1"), (1L, 31L, "L2"), (2L, 5L, "L3"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 100L), // before L1: must not match forward
      (1L, 20L, 200L), // ties L1's ts: inclusive match
      (1L, 30L, 300L)) // before L2: no forward match for L2
      .toDF("k", "ts", "value")
    val out = AsOf.asOfJoinForward(left, right, "k", "ts",
      leftCols = Seq("tag"), rightCols = Seq("value"))
      .collect().map(r => r.getString(r.fieldIndex("tag")) ->
        (if (r.isNullAt(r.fieldIndex("asof_value"))) None
         else Some(r.getLong(r.fieldIndex("asof_value"))))).toMap
    assert(out("L1") === Some(200L), "equal-ts right row must match (inclusive)")
    assert(out("L2") === None, "no right row at/after 31")
    assert(out("L3") === None, "no right rows for key 2 at all")
  }

  test("bucketedRangeJoin: integer bucket math agrees above 2^53") {
    // doubles can't represent these exactly — double-division bucketing
    // would disagree between the point and interval sides for some
    // values; integer div must keep them identical
    val base = (1L << 53) + 1L
    val pts = (0L until 8L).map(i => (1L, base + i * 1001L)).toDF("k", "pt")
    val ivs = (0L until 8L).map(i => (1L, base + i * 1001L - 1L, base + i * 1001L + 1L))
      .toDF("k", "s", "e")
    val n = RangeJoin.bucketedRangeJoin(pts, ivs, "k", "pt", "s", "e", bucketUs = 1000L)
      .count()
    assert(n === 8L)
  }

  test("bucketedRangeJoin: inverted intervals match nothing and don't blow up the explode") {
    val pts = Seq((1L, 100L)).toDF("k", "pt")
    val ivs = Seq(
      (1L, 90L, 110L),          // valid, matches
      (1L, 5000L, 10L)          // inverted: would explode 5 buckets descending
    ).toDF("k", "s", "e")
    val rows = RangeJoin.bucketedRangeJoin(pts, ivs, "k", "pt", "s", "e", bucketUs = 100L)
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("s") === 90L)
  }

  test("bucketedRangeJoin: negative timestamps bucket by floor, not truncation") {
    val pts = Seq((1L, -150L)).toDF("k", "pt")
    val ivs = Seq((1L, -160L, -140L)).toDF("k", "s", "e")
    val n = RangeJoin.bucketedRangeJoin(pts, ivs, "k", "pt", "s", "e", bucketUs = 100L)
      .count()
    assert(n === 1L)
  }

  test("sessionize works on frames without an event_id column") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val out = Sessionize.userSessions(ev, "user_id", "ts", 1800L)
      .collect().head
    assert(out.getAs[Long]("n_sessions") === 2L)
    assert(out.getAs[Long]("n_events") === 3L)
  }
}
