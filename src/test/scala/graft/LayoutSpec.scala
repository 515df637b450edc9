package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D95 — layout file-skipping audit: hand-verified zone
  * classification, half-open boundary semantics, row conservation,
  * and the property the operator exists to measure — a range-
  * clustered write prunes, a hash write does not.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def day(d: String) = java.sql.Date.valueOf(d)

  test("pruneAudit: hand-verified zones, half-open bounds, row conservation") {
    // Three files with KNOWN zones, written one per range partition:
    // f0 = [Jan, Feb], f1 = [Mar, Apr], f2 = [May, Jun]. Predicate
    // [1997-03-01, 1997-05-01): f0 skips (max < lo), f2 skips
    // (min >= hi — the half-open edge: a file STARTING exactly at hi
    // must skip), f1 scans.
    val files = Seq(
      Seq((1L, day("1997-01-10")), (2L, day("1997-02-20"))),
      Seq((3L, day("1997-03-01")), (4L, day("1997-04-30"))),
      Seq((5L, day("1997-05-01")), (6L, day("1997-06-15"))))
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_spec").toString
    // one append per file -> zones are exactly the hand-stated ones
    files.foreach(f => f.toDF("id", "d").coalesce(1)
      .write.mode("append").parquet(s"$dir/clustered"))
    val got = graft.operators.Layout.pruneAudit(spark, dir, "clustered",
        "d", "1997-03-01", "1997-05-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    assert(got === (("clustered", 3L, 2L, 4L, 2L)))
  }

  test("writeLayouts: clustered layout prunes, hashed does not, rows conserved") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 2000).map { i =>
      (i.toLong, new java.sql.Date(day("1997-01-01").getTime +
        rng.nextInt(365).toLong * 86400000L))
    }.toDF("id", "d")
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_spec2").toString
    graft.operators.Layout.writeLayouts(rows, "d", "id", nFiles = 8, dir = dir)
    val audit = graft.operators.Layout.pruneAuditBoth(spark, dir,
        "d", "1997-07-01", "1997-09-01")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (hFiles, hSkip, hRowsSkip, hRowsScan) = audit("hashed")
    val (cFiles, cSkip, cRowsSkip, cRowsScan) = audit("clustered")
    // every row is accounted for exactly once in both layouts
    assert(hRowsSkip + hRowsScan === 2000L)
    assert(cRowsSkip + cRowsScan === 2000L)
    assert(hFiles === 8L && cFiles === 8L)
    // hash layout: every file spans ~the full year -> nothing skips;
    // range-clustered: a 2-month predicate leaves most files outside
    assert(hSkip === 0L, s"hashed skipped $hSkip")
    assert(cSkip >= 5L, s"clustered skipped only $cSkip of 8")
    // skipped files hold no matching rows, so every predicate row must
    // live inside the scanned-row budget
    val matching = rows.filter(col("d") >= lit(day("1997-07-01")) &&
      col("d") < lit(day("1997-09-01"))).count()
    assert(matching > 0L && matching <= cRowsScan)
  }
}
