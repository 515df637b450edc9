package graft.heap

import graft.SparkTestSession
import HprofModel.{BasicType, Sub}
import org.scalatest.funsuite.AnyFunSuite

/** Reference robo-mode file contract: after flattenExport the export
  * is flat `<table>_chunk<N>.parquet` files, addressable by glob, with
  * identical contents to the directory layout.
  */
class FlattenExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("flattenExport renames to chunked files readable by glob") {
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val box = w.defineClass("java.lang.Integer", obj,
      instanceFields = Seq("value" -> BasicType.Int))
    (1 to 10).foreach(i => w.instance(box, Seq(BasicType.Int -> i)))
    w.gcRoot(Sub.RootJniGlobal, w.byteArray("x"))
    val dir = java.nio.file.Files.createTempDirectory("flat")
    val hp = dir.resolve("t.hprof").toString
    w.writeTo(hp)
    val out = dir.resolve("pq").toString
    new HeapDump(spark, hp).writeParquet(out)

    def parquetBytes(dir: java.io.File): Long = dir.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length()).sum
    val oiBytes = parquetBytes(new java.io.File(out, "_object_index"))
    val beforeBox = spark.read.parquet(
      new java.io.File(out).listFiles().map(_.getName)
        .find(_.startsWith("java.lang.Integer_")).map(n => s"$out/$n").get).count()

    HeapDump.flattenExport(out)

    val files = new java.io.File(out).listFiles()
    assert(files.forall(f => f.isFile && f.getName.matches(".+_chunk\\d+\\.parquet")),
      files.map(_.getName).mkString(", "))
    // underscore tables keep the reference naming; Spark treats
    // `_`-prefixed basenames as hidden (DuckDB-glob readers do not),
    // so verify those chunks at the file level: same bytes, new names
    val oiChunks = files.filter(_.getName.startsWith("_object_index_chunk"))
    assert(oiChunks.nonEmpty)
    assert(oiChunks.map(_.length()).sum === oiBytes)
    // class tables have no underscore — Spark glob addressing works
    assert(spark.read.parquet(s"$out/java.lang.Integer_*_chunk*.parquet").count() === beforeBox)
    assert(beforeBox === 10L)
  }
}
