package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D66 declarative constraint suite: hand-counted violations for every
  * rule type, the explicit null semantics (NULL passes range/set/FK —
  * nullability is notNull's job), and the single-pass plan shape.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = Seq(
    // (id, qty: java.lang.Double, flag, fk)
    (1L, java.lang.Double.valueOf(5.0), "A", java.lang.Long.valueOf(10L)),
    (1L, java.lang.Double.valueOf(99.0), "X", java.lang.Long.valueOf(11L)), // dup id, out of range, bad flag
    (2L, null.asInstanceOf[java.lang.Double], null, null.asInstanceOf[java.lang.Long]), // nulls
    (3L, java.lang.Double.valueOf(7.0), "N", java.lang.Long.valueOf(99L))  // orphan fk
  ).toDF("id", "qty", "flag", "fk")

  test("hand-counted violations per rule type; NULL passes range/set/FK") {
    val ref = Seq(10L, 11L).toDF("k")
    val got = Quality.check(fixture,
        rules = Seq(
          Quality.notNull("qty"),
          Quality.inRange("qty", lit(1), lit(50)),
          Quality.inSet("flag", Seq("A", "N", "R"))),
        uniqueKeys = Seq(("unique_id", Seq("id"))),
        foreignKeys = Seq(("fk_ref", "fk", ref, "k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("not_null_qty") === ((4L, 1L, false)))
    assert(got("range_qty") === ((4L, 1L, false)))   // 99 violates; NULL passes
    assert(got("set_flag") === ((4L, 1L, false)))    // X violates; NULL passes
    assert(got("unique_id") === ((4L, 2L, false)))   // both id=1 rows count
    assert(got("fk_ref") === ((4L, 1L, false)))      // 99 orphan; NULL passes
    // all-clean table: every rule passes
    val clean = Quality.check(fixture.filter($"id" === 3L),
        rules = Seq(Quality.notNull("qty"), Quality.inRange("qty", lit(1), lit(50))),
        uniqueKeys = Seq(("unique_id", Seq("id"))),
        foreignKeys = Seq(("fk_ref", "fk", Seq(99L).toDF("k"), "k")))
      .collect()
    assert(clean.forall(_.getBoolean(3)))
  }

  test("robustOutliers: hand-worked median/MAD, the mean-breaking outlier is caught") {
    // group g: values 1.00×5 and one 100.00 — a mean/σ z-score is
    // dragged by the outlier; median=100c, MAD=0c, so the 10000c row
    // is the ONLY |dev| > 5·MAD hit. Group h: symmetric {1,2,3},
    // median 2.00, MAD 1.00, no outliers at k=5.
    val df = (Seq.fill(5)(("g", 1.00)) :+ (("g", 100.00))) ++
      Seq(("h", 1.00), ("h", 2.00), ("h", 3.00)) match {
      case rows => rows.toDF("grp", "value")
    }
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.Quality.robustOutliers(
          df.repartition(parts), "grp", "value")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got("g") === ((6L, 100L, 0L, 1L)), s"parts=$parts")
      assert(got("h") === ((3L, 200L, 100L, 0L)))
    }
  }

  test("row rules are ONE aggregate pass; suite is UDF- and cartesian-free") {
    val rules = Seq(Quality.notNull("qty"), Quality.inRange("qty", lit(1), lit(50)),
      Quality.inSet("flag", Seq("A")))
    val rowPlan = Quality.rowChecks(fixture, rules)
      .queryExecution.executedPlan.toString
    // one scan, one global aggregate — rules do not multiply passes
    assert("FileScan|LocalTableScan".r.findAllIn(rowPlan).size <= 2, rowPlan)
    val full = Quality.check(fixture, rules,
        uniqueKeys = Seq(("u", Seq("id"))),
        foreignKeys = Seq(("f", "fk", Seq(1L).toDF("k"), "k")))
      .queryExecution.executedPlan.toString
    assert(!full.contains("ScalaUDF") && !full.contains("CartesianProduct"), full)
    // partition invariance
    val a = Quality.check(fixture.repartition(5), rules)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val b = Quality.check(fixture, rules)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(a === b)
  }

  test("profile: hand-counted stats, typed min/max order, all-null column") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType),
      StructField("empty", StringType)))
    // ids 9 and 10: STRING comparison would say max = "9"; the typed
    // aggregate must say max = "10"
    val rows = Seq(
      Row(9L, "a", null), Row(10L, "b", null),
      Row(2L, "a", null), Row(null, null, null))
    val df = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val got = Quality.profile(df, Seq("id", "tag", "empty"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(got("id") === ((4L, 1L, 3L, Some("2"), Some("10"))))
    assert(got("tag") === ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(got("empty") === ((4L, 4L, 0L, None, None)))
    // partition invariance
    val re = Quality.profile(df.repartition(3), Seq("id", "tag", "empty"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(re === got.view.mapValues(_._3).toMap)
  }
}
