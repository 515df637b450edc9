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

  test("queryPage walks a result three pages with has_more/next_offset") {
    val hs = new HeapSessions(spark)
    hs.open(export("p", 7), "dump_p")
    val sql = "SELECT value FROM java_lang_Integer ORDER BY value"
    val p1 = hs.queryPage("dump_p", sql, limit = 3)
    assert(p1.rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    assert(p1.hasMore && p1.nextOffset === 3L)
    assert(p1.columns === Seq("value"))
    val p2 = hs.queryPage("dump_p", sql, limit = 3, offset = p1.nextOffset)
    assert(p2.rows.map(_.getInt(0)).toSeq === Seq(4, 5, 6))
    assert(p2.hasMore && p2.nextOffset === 6L)
    val p3 = hs.queryPage("dump_p", sql, limit = 3, offset = p2.nextOffset)
    assert(p3.rows.map(_.getInt(0)).toSeq === Seq(7))
    assert(!p3.hasMore && p3.nextOffset === 7L)
    intercept[IllegalArgumentException](hs.queryPage("dump_p", sql, limit = 0))
    hs.close("dump_p")
  }

  test("bare-view ownership is shared across registry instances") {
    // instance A's bare views must not survive instance B's switch:
    // ownership lives in the companion, keyed by SparkSession
    val hsA = new HeapSessions(spark)
    val hsB = new HeapSessions(spark)
    hsA.open(export("xa", 2), "dump_xa")
    assert(hsA.query("dump_xa", "SELECT COUNT(*) FROM java_lang_Integer")
      .collect()(0).getLong(0) === 2L)
    hsB.open(export("xb", 4), "dump_xb")
    // the bare name now belongs to dump_xb, even though A registered it
    assert(spark.sql("SELECT COUNT(*) FROM java_lang_Integer")
      .collect()(0).getLong(0) === 4L)
    hsB.close("dump_xb")
    // B's close dropped the bare views entirely; no stale resolution
    intercept[Exception](spark.sql("SELECT COUNT(*) FROM java_lang_Integer"))
    hsA.close("dump_xa")
  }

  test("analyzeJson emits the reference result shape as valid JSON") {
    import spark.implicits._
    val dir = export("j", 4)
    val json = new HeapAnalysis(new HeapTables(spark, dir))
      .analyzeJson(maxTier = 3, sessionId = "dump_j")
    // must round-trip through a real JSON parser
    val parsed = spark.read.json(Seq(json).toDS)
    val fields = parsed.schema.fieldNames.toSet
    assert(Set("session_id", "parquet_dir", "summary", "top_types", "categories",
      "byte_array_distribution", "waste_findings",
      "referrer_stats", "ownership", "retained", "path_exemplars",
      "classloaders", "top_retained", "references",
      "total_estimated_waste_bytes").subsetOf(fields), fields)
    assert(!parsed.schema.fieldNames.contains("_corrupt_record"), json.take(400))
    // reference shape: summary is ONE object (not a row array) with
    // session/dir metadata alongside
    assert(parsed.schema("summary").dataType.typeName === "struct")
    val head = parsed.select("session_id", "parquet_dir").collect()(0)
    assert(head.getString(0) === "dump_j")
    assert(head.getString(1) === dir)
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
