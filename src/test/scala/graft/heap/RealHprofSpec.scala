package graft.heap

import graft.SparkTestSession
import HprofModel.{BasicType, Tag}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ultimate format check: dump a REAL HotSpot JVM with jmap and
  * run the full distributed ingestion over it — real class dumps,
  * compact strings, every GC-root flavor, thousands of classes.
  * Skips cleanly if jmap can't produce a dump in this environment.
  */
class RealHprofSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def makeRealDump(jvmFlags: Seq[String] = Seq.empty): Option[String] = {
    val dir = java.nio.file.Files.createTempDirectory("realheap")
    val src = dir.resolve("Tiny.java")
    java.nio.file.Files.writeString(src,
      """public class Tiny {
        |  public static void main(String[] a) throws Exception {
        |    java.util.Map<String, String> m = new java.util.HashMap<>();
        |    for (int i = 0; i < 1000; i++) m.put("key" + i, "val" + i);
        |    System.out.println("READY " + m.size());
        |    Thread.sleep(120000);
        |  }
        |}""".stripMargin)
    if (new ProcessBuilder("javac", src.toString).inheritIO().start().waitFor() != 0) return None
    val cmd = Seq("java", "-Xmx64m") ++ jvmFlags ++ Seq("-cp", dir.toString, "Tiny")
    val proc = new ProcessBuilder(cmd: _*).start()
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(proc.getInputStream))
      val line = reader.readLine() // wait for READY
      if (line == null || !line.startsWith("READY")) return None
      val hprof = dir.resolve("real.hprof").toString
      val jmap = new ProcessBuilder("jmap", s"-dump:live,format=b,file=$hprof",
        proc.pid().toString).start()
      if (jmap.waitFor() != 0) return None
      Some(hprof)
    } finally proc.destroyForcibly()
  }

  test("real jmap heap dump ingests end to end") {
    makeRealDump() match {
      case None => cancel("jmap dump unavailable in this environment")
      case Some(hprof) =>
        info(f"dump size: ${new java.io.File(hprof).length() / 1e6}%.1f MB")
        val hd = new HeapDump(spark, hprof)
        assert(hd.header.formatName === "JAVA PROFILE 1.0.2")
        assert(hd.records.exists(r => Tag.isHeapSegment(r.tag)))

        // thousands of real classes resolve
        assert(hd.index.classes.size > 500)
        val hm = hd.index.classes.values.find(_.name == "java.util.HashMap")
        assert(hm.isDefined)
        assert(hm.get.layout.map(_.name).contains("size"))

        // object index sees real strings
        val idx = hd.objectIndex
        val nStrings = idx.filter(col("type_name") === "java.lang.String").count()
        assert(nStrings > 1000)

        // typed decode of real String instances + content via byte[]
        val strs = hd.instancesByName("java.lang.String").get
        assert(strs.columns.contains("value"))
        val bytes = hd.primitiveArrays(BasicType.Byte)
        val decode = udf((v: scala.collection.Seq[Byte]) =>
          new String(v.toArray, java.nio.charset.StandardCharsets.ISO_8859_1))
        val contents = strs.select(col("value").as("bid"))
          .join(bytes.withColumnRenamed("obj_id", "bid"), "bid")
          .select(decode(col("values")).as("text"))
          .filter(col("text").isin("key999", "val999", "READY "))
        assert(contents.count() >= 2)

        // real GC roots of several kinds
        val rootKinds = hd.gcRoots.select("root_type").distinct().count()
        assert(rootKinds >= 3)

        // hierarchy: HashMap extends AbstractMap
        val hier = hd.classHierarchy
          .filter(col("class_name") === "java.util.HashMap")
          .select("super_class_name").collect().map(_.getString(0))
        assert(hier.contains("java.util.AbstractMap"))
    }
  }

  /** Layout-drift hardening: the SAME workload dumped from a JVM with
    * compact strings DISABLED and class-data sharing off — String
    * backing flips from byte[] to char[], the CDS-mapped metadata
    * layout disappears, object addresses shift. The parser must not
    * care.
    */
  test("real jmap dump from a -XX:-CompactStrings -Xshare:off JVM ingests too") {
    makeRealDump(Seq("-XX:-CompactStrings", "-Xshare:off")) match {
      case None => cancel("jmap dump unavailable in this environment")
      case Some(hprof) =>
        info(f"dump size: ${new java.io.File(hprof).length() / 1e6}%.1f MB")
        val hd = new HeapDump(spark, hprof)
        assert(hd.header.formatName === "JAVA PROFILE 1.0.2")
        assert(hd.index.classes.size > 500)

        // with compact strings DISABLED every String's byte[] holds
        // UTF-16 code units (2 bytes/char, platform order) instead of
        // Latin-1 — the payload layout the first fixture never shows
        val strs = hd.instancesByName("java.lang.String").get
        val bytes = hd.primitiveArrays(BasicType.Byte)
        val decodeUtf16 = udf((v: scala.collection.Seq[Byte]) =>
          new String(v.toArray, java.nio.charset.StandardCharsets.UTF_16LE))
        val contents = strs.select(col("value").as("bid"))
          .join(bytes.withColumnRenamed("obj_id", "bid"), "bid")
          .select(decodeUtf16(col("values")).as("text"))
          .filter(col("text").isin("key999", "val999"))
        assert(contents.count() >= 2,
          "UTF-16 strings must decode on a -XX:-CompactStrings dump")

        // record tallies sane: class dumps, instances, prim arrays all seen
        val counts = hd.countRecords.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(counts.getOrElse("HeapDumpSegment", 0L) + counts.getOrElse("HeapDump", 0L) >= 1L)
        val rootKinds = hd.gcRoots.select("root_type").distinct().count()
        assert(rootKinds >= 3)
    }
  }
}
