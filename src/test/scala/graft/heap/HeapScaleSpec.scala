package graft.heap

import graft.SparkTestSession
import HprofModel._
import org.scalatest.funsuite.AnyFunSuite

/** Volume test for the distributed ingestion path: ~120k objects
  * across 32 heap segments — every segment parses in its own task, so
  * this exercises the same parallel shape a multi-GB dump would
  * (SURVEY.md §5), just scaled to CI size.
  */
class HeapScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("120k-object heap ingests correctly across 32 segments") {
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val str = w.defineClass("java.lang.String", obj,
      instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
    val box = w.defineClass("java.lang.Integer", obj,
      instanceFields = Seq("value" -> BasicType.Int))

    val nStrings = 40000
    val nBoxes = 20000
    val rnd = new scala.util.Random(42)
    val byteIds = (0 until nStrings).map { i =>
      w.byteArray(s"string-payload-${i % 1000}-${rnd.nextInt(50)}")
    }
    byteIds.zipWithIndex.foreach { case (b, i) =>
      w.instance(str, Seq(BasicType.Object -> b, BasicType.Int -> i))
    }
    (0 until nBoxes).foreach(i => w.instance(box, Seq(BasicType.Int -> i % 128)))
    (0 until 1000).foreach(i => w.objArray(obj, Seq.fill(4)(byteIds(i))))

    val path = java.nio.file.Files.createTempDirectory("heap_scale").resolve("big.hprof").toString
    val t0 = System.nanoTime()
    w.writeTo(path, segments = 32)
    val sizeMb = new java.io.File(path).length() / 1e6
    val tWrite = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val hd = new HeapDump(spark, path)
    val counts = hd.objectIndex.groupBy("type_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tIngest = (System.nanoTime() - t1) / 1e9
    info(f"heap $sizeMb%.1f MB: write $tWrite%.1f s, index+count $tIngest%.1f s")

    assert(counts("java.lang.String") === nStrings.toLong)
    assert(counts("java.lang.Integer") === nBoxes.toLong)
    assert(counts("byte[]") === nStrings.toLong)
    assert(counts("java.lang.Object[]") === 1000L)
    assert(hd.records.count(r => Tag.isHeapSegment(r.tag)) === 32)

    // typed decode at volume: every string's hash field survives
    val hashSum = hd.instances(str).agg(org.apache.spark.sql.functions.sum("hash"))
      .collect()(0).getLong(0)
    assert(hashSum === (0L until nStrings).sum)

    // duplicate-string analysis finds the planted 1000-value clusters
    val out = java.nio.file.Files.createTempDirectory("heap_scale_pq").toString
    hd.writeParquet(out)
    val dup = new HeapAnalysis(new HeapTables(spark, out)).checkDuplicateStrings().get
    assert(dup.affectedCount > 15000) // 40k draws over 50k payload keys → ~22k in dup groups
  }
}
