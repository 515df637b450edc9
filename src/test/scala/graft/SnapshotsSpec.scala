package graft

import graft.operators.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D54 — snapshot commits must be isolated (history stays readable
  * through replaces), time travel must resolve exact file sets, and
  * vacuum must drop exactly the unreferenced tail.
  */
class SnapshotsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ids(table: String, v: Option[Int] = None): Set[Long] =
    Snapshots.read(spark, table, v).select("id")
      .collect().map(_.getLong(0)).toSet

  test("append, append, replace: every version stays exactly readable") {
    val table = java.nio.file.Files.createTempDirectory("graft_snap").toString
    assert(Snapshots.currentVersion(table).isEmpty)
    assert(Snapshots.commitAppend(spark, table,
      Seq(1L, 2L).toDF("id")) === 1)
    assert(Snapshots.commitAppend(spark, table,
      Seq(3L, 4L).toDF("id")) === 2)
    assert(Snapshots.commitReplace(spark, table,
      Snapshots.read(spark, table).filter(col("id") =!= 2L)) === 3)
    assert(ids(table, Some(1)) === Set(1L, 2L))
    assert(ids(table, Some(2)) === Set(1L, 2L, 3L, 4L))
    assert(ids(table, Some(3)) === Set(1L, 3L, 4L))
    assert(ids(table) === Set(1L, 3L, 4L), "default read = latest")
    assert(Snapshots.currentVersion(table) === Some(3))
  }

  test("a replace commit shares no files with the version it replaced") {
    val table = java.nio.file.Files.createTempDirectory("graft_snap2").toString
    Snapshots.commitAppend(spark, table, Seq(1L, 2L).toDF("id"))
    Snapshots.commitReplace(spark, table,
      Snapshots.read(spark, table).filter(col("id") === 1L))
    val v1 = Snapshots.files(table, Some(1)).toSet
    val v2 = Snapshots.files(table, Some(2)).toSet
    assert(v1.intersect(v2).isEmpty)
  }

  test("vacuum drops old manifests and orphaned files, keeps the window") {
    val table = java.nio.file.Files.createTempDirectory("graft_snap3").toString
    Snapshots.commitAppend(spark, table, Seq(1L).toDF("id"))
    Snapshots.commitReplace(spark, table, Seq(2L).toDF("id"))
    Snapshots.commitAppend(spark, table, Seq(3L).toDF("id"))
    val v1Files = Snapshots.files(table, Some(1))
    Snapshots.vacuum(table, keepVersions = 2)
    // v1's data is referenced by no kept manifest → gone
    assert(v1Files.forall(f => !java.nio.file.Files.exists(
      java.nio.file.Paths.get(f))))
    intercept[IllegalArgumentException](Snapshots.files(table, Some(1)))
    assert(ids(table, Some(2)) === Set(2L))
    assert(ids(table, Some(3)) === Set(2L, 3L))
  }

  test("vacuum never deletes files still referenced by a kept version") {
    val table = java.nio.file.Files.createTempDirectory("graft_snap4").toString
    Snapshots.commitAppend(spark, table, Seq(1L).toDF("id"))
    Snapshots.commitAppend(spark, table, Seq(2L).toDF("id")) // v2 refs v1's files
    Snapshots.commitAppend(spark, table, Seq(3L).toDF("id"))
    Snapshots.vacuum(table, keepVersions = 2)
    // v1's manifest is gone but its data file lives on in v2/v3
    intercept[IllegalArgumentException](Snapshots.files(table, Some(1)))
    assert(ids(table, Some(2)) === Set(1L, 2L))
    assert(ids(table, Some(3)) === Set(1L, 2L, 3L))
  }
}
