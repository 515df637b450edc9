package graft.heap

import graft.SparkTestSession
import HprofModel.BasicType
import org.scalatest.funsuite.AnyFunSuite

/** CLI surface smoke: convert then SQL-query through the same session
  * (main() paths for count/dump/analyze print; the underlying calls
  * are covered by the other heap specs).
  */
class HeapCliSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("convert + query path works end to end") {
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val box = w.defineClass("java.lang.Integer", obj,
      instanceFields = Seq("value" -> BasicType.Int))
    (1 to 7).foreach(i => w.instance(box, Seq(BasicType.Int -> i)))
    val dir = java.nio.file.Files.createTempDirectory("heapcli")
    val hp = dir.resolve("t.hprof").toString
    w.writeTo(hp)
    val out = dir.resolve("pq").toString

    new HeapDump(spark, hp).writeParquet(out)
    val n = HeapSql.query(spark, out,
      "SELECT SUM(value) FROM java_lang_Integer").collect()(0).getLong(0)
    assert(n === 28L)

    val rendered = new HeapDump(spark, hp).renderObjects(20)
    assert(rendered.count(_.startsWith("java.lang.Integer@")) === 7)
  }
}
