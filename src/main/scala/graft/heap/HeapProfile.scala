package graft.heap

import HprofModel.BasicType
import org.apache.spark.sql.SparkSession

/** Phase-level profiler for the heap ingest+export path (the
  * `q_heap_ingest_export` bench entry): generates the same synthetic
  * dump Bench does and times every export phase separately, so a
  * regression (or a win) can be attributed to pass-1 indexing, a
  * specific system table, or the clustered class-table write.
  * Development tool — not part of the driver contract.
  */
object HeapProfile {
  private def t[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** The exact corpus Bench.heapIngest generates. */
  def benchDump(dir: java.nio.file.Path): String = {
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val str = w.defineClass("java.lang.String", obj,
      instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
    val box = w.defineClass("java.lang.Integer", obj,
      instanceFields = Seq("value" -> BasicType.Int))
    val classes = (0 until 200).map(i => w.defineClass(s"com.bench.Gen$i", obj,
      instanceFields = Seq("a" -> BasicType.Long, "b" -> BasicType.Int, "ref" -> BasicType.Object)))
    val rnd = new scala.util.Random(7L)
    val byteIds = (0 until 120000).map(i => w.byteArray(s"payload-${i % 5000}-${rnd.nextInt(100)}"))
    byteIds.zipWithIndex.foreach { case (b, i) =>
      w.instance(str, Seq(BasicType.Object -> b, BasicType.Int -> i))
    }
    (0 until 60000).foreach(i => w.instance(box, Seq(BasicType.Int -> i % 1024)))
    (0 until 120000).foreach { i =>
      w.instance(classes(i % classes.length),
        Seq(BasicType.Long -> i.toLong, BasicType.Int -> i, BasicType.Object -> byteIds(i % byteIds.length)))
    }
    val hprof = dir.resolve("bench.hprof").toString
    w.writeTo(hprof, segments = 64)
    hprof
  }

  def run(spark: SparkSession): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_profile_heap")
    val hprof = t("generate+write hprof")(benchDump(dir))
    println(f"[profile] dump size: ${new java.io.File(hprof).length() / 1e6}%.1f MB")
    val out = dir.resolve("pq").toString
    for (r <- 1 to 2) {
      val hd = t(s"HeapDump ctor + pass-1 index (run $r)")(new HeapDump(spark, hprof))
      def w2(df: org.apache.spark.sql.DataFrame, name: String): Unit =
        df.write.mode("overwrite").parquet(s"$out/$name")
      t(s"  _object_index (run $r)")(w2(hd.objectIndex, "_object_index"))
      t(s"  _class_hierarchy (run $r)")(w2(hd.classHierarchy, "_class_hierarchy"))
      t(s"  _object_arrays (run $r)")(w2(hd.objectArrays, "_object_arrays"))
      t(s"  _gc_roots (run $r)")(w2(hd.gcRoots, "_gc_roots"))
      t(s"  _static_fields (run $r)")(w2(hd.staticFields, "_static_fields"))
      t(s"  stack frames+traces (run $r)") {
        w2(hd.stackFrames, "_stack_frames"); w2(hd.stackTraces, "_stack_traces")
      }
      t(s"  prim arrays x8 (run $r)") {
        val prim = hd.primitiveArraysAll.persist()
        try hd.primCols.keys.toSeq.sorted.foreach { tag =>
          w2(hd.primitiveArrays(tag, prim), s"_primitive_arrays_${BasicType.javaName(tag)}")
        } finally prim.unpersist()
      }
      for (salt <- Seq(16, 4, 1)) {
        spark.conf.set("spark.graft.heap.saltBuckets", salt)
        t(s"  class tables single-pass salt=$salt (run $r)")(hd.writeClassTablesSinglePass(out))
      }
      spark.conf.unset("spark.graft.heap.saltBuckets")
      t(s"  FULL writeParquet (run $r)")(hd.writeParquet(out))
    }
  }
}
