package graft.heap

import graft.SparkTestSession
import HprofModel.BasicType
import org.scalatest.funsuite.AnyFunSuite

/** Session registry parity with the reference MCP surface: open /
  * list / query / close keep files; cleanup deletes them and demands
  * confirmation.
  */
class HeapSessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def export(tag: String, n: Int): String = {
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val box = w.defineClass("java.lang.Integer", obj,
      instanceFields = Seq("value" -> BasicType.Int))
    (1 to n).foreach(i => w.instance(box, Seq(BasicType.Int -> i)))
    val dir = java.nio.file.Files.createTempDirectory(s"sess_$tag")
    val hp = dir.resolve("t.hprof").toString
    w.writeTo(hp)
    val out = dir.resolve("pq").toString
    new HeapDump(spark, hp).writeParquet(out)
    out
  }

  test("open/list/query/close across two concurrent sessions") {
    val hs = new HeapSessions(spark)
    val a = hs.open(export("a", 3), "dump_a")
    val b = hs.open(export("b", 5), "dump_b")
    assert(hs.list.map(_.id) === Seq("dump_a", "dump_b"))
    assert(a.tables.contains("_object_index"))

    // prefixed views disambiguate concurrent sessions
    val na = spark.sql("SELECT COUNT(*) FROM dump_a___object_index WHERE type_name = 'java.lang.Integer'")
      .collect()(0).getLong(0)
    val nb = spark.sql("SELECT COUNT(*) FROM dump_b___object_index WHERE type_name = 'java.lang.Integer'")
      .collect()(0).getLong(0)
    assert(na === 3L && nb === 5L)

    // bare-name query binds to the addressed session
    assert(hs.query("dump_a", "SELECT SUM(value) FROM java_lang_Integer")
      .collect()(0).getLong(0) === 6L)
    assert(hs.query("dump_b", "SELECT SUM(value) FROM java_lang_Integer")
      .collect()(0).getLong(0) === 15L)

    assert(hs.listTables("dump_a").count() > 0)

    val dirA = a.dir
    hs.close("dump_a")
    assert(hs.list.map(_.id) === Seq("dump_b"))
    assert(new java.io.File(dirA).exists, "close must keep files")
    intercept[NoSuchElementException](hs.query("dump_a", "SELECT 1"))
  }

  test("analyzeJson emits the reference result shape as valid JSON") {
    import spark.implicits._
    val dir = export("j", 4)
    val json = new HeapAnalysis(new HeapTables(spark, dir)).analyzeJson(maxTier = 3)
    // must round-trip through a real JSON parser
    val parsed = spark.read.json(Seq(json).toDS)
    val fields = parsed.schema.fieldNames.toSet
    assert(Set("summary", "top_types", "categories", "byte_array_distribution",
      "waste_findings", "total_estimated_waste_bytes").subsetOf(fields), fields)
    assert(!parsed.schema.fieldNames.contains("_corrupt_record"), json.take(400))
  }

  test("cleanup requires confirm and deletes the directory") {
    val hs = new HeapSessions(spark)
    val s = hs.open(export("c", 2), "dump_c")
    intercept[IllegalArgumentException](hs.cleanup("dump_c"))
    assert(new java.io.File(s.dir).exists)
    hs.cleanup("dump_c", confirm = true)
    assert(!new java.io.File(s.dir).exists)
    assert(hs.list.isEmpty)
  }
}
