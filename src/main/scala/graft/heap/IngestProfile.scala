package graft.heap

import org.apache.spark.sql.SparkSession

/** Phase-level profile of the heap ingest+export path on the same
  * synthetic dump the bench times — run with
  * `sbt "runMain graft.heap.IngestProfile"` while iterating on
  * export throughput (SURVEY §2.A). Prints per-phase seconds so a
  * regression can be attributed to pass-1 metadata, the single-pass
  * system-table scan, or the per-class clustered write.
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.heap.{HeapDump, HprofWriter}
    import graft.heap.HprofModel.BasicType
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val str = w.defineClass("java.lang.String", obj,
      instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
    val box = w.defineClass("java.lang.Integer", obj,
      instanceFields = Seq("value" -> BasicType.Int))
    val classes = (0 until 200).map(i => w.defineClass(s"com.bench.Gen$i", obj,
      instanceFields = Seq("a" -> BasicType.Long, "b" -> BasicType.Int, "ref" -> BasicType.Object)))
    val rnd = new scala.util.Random(7L)
    val byteIds = (0 until 1200000).map(i => w.byteArray(s"payload-${i % 50000}-${rnd.nextInt(100)}"))
    byteIds.zipWithIndex.foreach { case (b, i) =>
      w.instance(str, Seq(BasicType.Object -> b, BasicType.Int -> i))
    }
    (0 until 600000).foreach(i => w.instance(box, Seq(BasicType.Int -> i % 1024)))
    (0 until 1200000).foreach { i =>
      w.instance(classes(i % classes.length),
        Seq(BasicType.Long -> i.toLong, BasicType.Int -> i, BasicType.Object -> byteIds(i % byteIds.length)))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_profile_heap")
    val hprof = dir.resolve("bench.hprof").toString
    w.writeTo(hprof, segments = 64)
    val mb = new java.io.File(hprof).length() / 1e6
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep (${mb.round} MB) ---")
      val hd = t("construct+pass1 index") { val h = new HeapDump(spark, hprof); h.index; h }
      val out = dir.resolve(s"pq$rep").toString
      t("writeParquet total (metadata writes overlapped)") { hd.writeParquet(out) }
      t("single-pass system+class tables alone") {
        hd.writeRoboTablesSinglePass(dir.resolve(s"pq${rep}b").toString)
      }
    }
    spark.stop()
  }
}
