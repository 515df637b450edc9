package graft.heap

import graft.SparkTestSession
import HprofModel.{BasicType, Sub}
import org.scalatest.funsuite.AnyFunSuite

/** The guide surface must stay TRUE: every fenced SQL example whose
  * tables exist in a session export has to actually run. (Reference
  * guide resources: server.py guide_setup/guide_sql_examples/
  * guide_waste_checks.)
  */
class HeapGuideSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val sessionDir: String = {
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val str = w.defineClass("java.lang.String", obj,
      instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
    val b1 = w.byteArray("dup")
    val b2 = w.byteArray("dup")
    val s1 = w.instance(str, Seq(BasicType.Object -> b1, BasicType.Int -> 1))
    w.instance(str, Seq(BasicType.Object -> b2, BasicType.Int -> 1))
    w.gcRoot(Sub.RootJniGlobal, s1)
    val f1 = w.stackFrame("run", "()V", "Worker.java", "java.lang.String", 42)
    w.stackTrace(1, 1, Seq(f1))
    val dir = java.nio.file.Files.createTempDirectory("guide")
    val hp = dir.resolve("t.hprof").toString
    w.writeTo(hp)
    val out = dir.resolve("pq").toString
    new HeapDump(spark, hp).writeParquet(out)
    out
  }

  test("guides catalogue names all three guides with real content") {
    assert(HeapGuide.guides.keySet === Set("setup", "sql-examples", "waste-checks"))
    assert(HeapGuide.setup.contains("writeParquet"))
    assert(HeapGuide.setup.contains("format(\"hprof\")"))
    assert(HeapGuide.wasteChecks.contains("Duplicate Strings"))
    assert(HeapGuide.wasteChecks.contains("CRITICAL"))
  }

  test("every runnable SQL example in the guide actually runs") {
    val hs = new HeapSessions(spark)
    hs.open(sessionDir, "guide_dump")
    val tables = hs.list.find(_.id == "guide_dump").get.tables.toSet
    val blocks = "(?s)```sql\\n(.*?)```".r
      .findAllMatchIn(HeapGuide.sqlExamples).map(_.group(1).trim).toSeq
    assert(blocks.size >= 7, s"guide lost its examples: ${blocks.size}")
    // an example is runnable when every table it names exists in the
    // export (the com_example_MyClass one is an intentional placeholder)
    val named = "(?i)(?:FROM|JOIN)\\s+([A-Za-z_][A-Za-z0-9_]*)".r
    var ran = 0
    blocks.foreach { sql =>
      val refs = named.findAllMatchIn(sql).map(_.group(1)).toSet
        .filterNot(Set("str_bytes", "refs")) // CTE names, not tables
      if (refs.subsetOf(tables)) {
        hs.query("guide_dump", sql).collect() // must not throw
        ran += 1
      }
    }
    assert(ran >= 5, s"only $ran examples were runnable against the export")
    hs.close("guide_dump")
  }
}
