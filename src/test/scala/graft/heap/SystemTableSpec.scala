package graft.heap

import graft.SparkTestSession
import HprofModel.BasicType
import org.scalatest.funsuite.AnyFunSuite

/** The multiplexed SystemTableWriter must keep the export contract of
  * the former DataFrame writes for DEGENERATE dumps too: a dump with
  * no arrays / no GC roots still yields every system table directory,
  * readable by Spark with the exact schema readers rely on, just with
  * zero rows.
  */
class SystemTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("export of a dump with only instances yields typed empty system tables") {
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val c = w.defineClass("com.example.Solo", obj,
      instanceFields = Seq("x" -> BasicType.Int))
    (0 until 10).foreach(i => w.instance(c, Seq(BasicType.Int -> i)))
    val dir = java.nio.file.Files.createTempDirectory("heap_systable")
    val hprof = dir.resolve("d.hprof").toString
    w.writeTo(hprof, segments = 2)
    val out = dir.resolve("pq").toString
    new HeapDump(spark, hprof).writeParquet(out)

    // every system table directory exists and reads back
    val oa = spark.read.parquet(s"$out/_object_arrays")
    assert(oa.count() === 0)
    assert(oa.schema.map(f => f.name -> f.dataType.simpleString) ===
      Seq("obj_id" -> "bigint", "class_name" -> "string", "elements" -> "array<bigint>"))
    val gr = spark.read.parquet(s"$out/_gc_roots")
    assert(gr.count() === 0)
    assert(gr.schema.fieldNames.toSeq ===
      Seq("root_type", "obj_id", "thread_serial", "frame_index"))
    for (t <- Seq("boolean", "byte", "char", "short", "int", "long", "float", "double")) {
      val pa = spark.read.parquet(s"$out/_primitive_arrays_$t")
      assert(pa.count() === 0, s"_primitive_arrays_$t")
      assert(pa.schema.fieldNames.toSeq === Seq("obj_id", "values"))
    }
    // the index holds the 10 instances plus the class rows
    val oi = spark.read.parquet(s"$out/_object_index")
    assert(oi.filter("type_name = 'com.example.Solo'").count() === 10)
    assert(oi.filter("type_name LIKE 'class %'").count() === 2)
    // and the typed class table decoded
    val solo = spark.read.parquet(s"$out/com.example.Solo_${c}")
    assert(solo.count() === 10)
    assert(solo.schema.fieldNames.toSeq === Seq("obj_id", "x"))
  }

  test("re-export over a previous export leaves no stale part files") {
    def build(n: Int): HprofWriter = {
      val w = new HprofWriter()
      val obj = w.defineClass("java.lang.Object")
      val c = w.defineClass("com.example.Re", obj,
        instanceFields = Seq("x" -> BasicType.Int))
      (0 until n).foreach(i => w.instance(c, Seq(BasicType.Int -> i)))
      (0 until n).foreach(i => w.byteArray(s"payload-$i"))
      w
    }
    val dir = java.nio.file.Files.createTempDirectory("heap_reexport")
    val out = dir.resolve("pq").toString
    // wide first export (many segments = many part files)
    val h1 = dir.resolve("one.hprof").toString
    build(64).writeTo(h1, segments = 16)
    new HeapDump(spark, h1).writeParquet(out)
    // narrow second export over the same directory
    val h2 = dir.resolve("two.hprof").toString
    build(8).writeTo(h2, segments = 2)
    new HeapDump(spark, h2).writeParquet(out)
    assert(spark.read.parquet(s"$out/_primitive_arrays_byte").count() === 8)
    assert(spark.read.parquet(s"$out/_object_index")
      .filter("type_name = 'com.example.Re'").count() === 8)
    assert(spark.read.parquet(out + "/com.example.Re_" +
      new HeapDump(spark, h2).index.classes.values.find(_.name == "com.example.Re").get.objId)
      .count() === 8)
  }
}
