package graft.queries

import graft.GateQuery
import graft.heap._
import graft.heap.HprofModel.{BasicType, Sub}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heap-module gate queries (SURVEY.md §2.A/B surfaced to the
  * driver): each builds a deterministic synthetic HPROF dump with the
  * A14 generator, runs the full distributed ingestion + analysis
  * path, and returns a DataFrame.
  *
  * The export lands at a FIXED path so the simpler analysis gates can
  * carry real DuckDB oracles: DuckDB re-runs the analysis SQL over the
  * exported parquet (the ingestion itself is value-asserted against
  * known synthetic heaps in HeapDumpSpec). The waste suite stays
  * rows-only — its findings assembly isn't one SQL statement.
  */
object Heap {

  /** Export location embedded in the static oracle SQL. Scoped by pid
    * so concurrent JVMs (a test run beside a Verify run) can't clobber
    * each other's export mid-read; the oracle_sql.json a given Verify
    * run emits always points at that same run's directory.
    */
  val exportDir: String = {
    val pid = ProcessHandle.current().pid()
    s"${System.getProperty("java.io.tmpdir")}/graft_heap_gate_demo_$pid/parquet"
  }

  /** One synthetic heap + parquet export per JVM, built lazily. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def demoDir(spark: SparkSession): String =
    cache.computeIfAbsent("demo", _ => {
      val w = new HprofWriter()
      val obj = w.defineClass("java.lang.Object")
      val str = w.defineClass("java.lang.String", obj,
        instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
      val hm = w.defineClass("java.util.HashMap", obj,
        instanceFields = Seq("size" -> BasicType.Int, "table" -> BasicType.Object))
      val oaCls = w.defineClass("[Ljava.lang.Object;", obj)
      val bs = (0 until 40).map(i => w.byteArray(s"payload-${i % 10}")) // 4x duplication
      val strs = bs.map(b => w.instance(str, Seq(BasicType.Object -> b, BasicType.Int -> b.toInt)))
      (0 until 8).foreach(_ => w.instance(hm, Seq(BasicType.Int -> 0, BasicType.Object -> 0L)))
      w.objArray(oaCls, Seq.empty)
      w.objArray(oaCls, Seq.fill(5)(0L))
      w.objArray(oaCls, strs.take(3))
      w.primArray(BasicType.Int, Seq.fill(16)(0))
      w.gcRoot(Sub.RootStickyClass, str)
      w.gcRoot(Sub.RootThreadObject, strs.head, threadSerial = 1)
      val f1 = w.stackFrame("main", "()V", "Main.java", "java.lang.String", 1)
      w.stackTrace(1, 1, Seq(f1))

      val dir = java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(exportDir).getParent)
      val hprof = dir.resolve("demo.hprof").toString
      w.writeTo(hprof, segments = 4)
      new HeapDump(spark, hprof).writeParquet(exportDir)
      exportDir
    })

  private def analysis(spark: SparkSession) =
    new HeapAnalysis(new HeapTables(spark, demoDir(spark)))

  /** A1-A11: ingestion round-trip — the robo object index. DuckDB
    * re-aggregates the same exported parquet.
    */
  val qHeapObjectIndex: GateQuery = GateQuery(
    "q_heap_object_index",
    s"""SELECT type_name, COUNT(*) AS n
       |FROM read_parquet('$exportDir/_object_index/*.parquet')
       |GROUP BY type_name
       |ORDER BY n DESC, type_name""".stripMargin) { (s, _) =>
    s.read.parquet(s"${demoDir(s)}/_object_index")
      .groupBy("type_name").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("type_name"))
  }

  /** B1/B2: summary + top types over the exported tables. */
  val qHeapTopTypes: GateQuery = GateQuery(
    "q_heap_top_types",
    s"""SELECT type_name, COUNT(*) AS obj_count
       |FROM read_parquet('$exportDir/_object_index/*.parquet')
       |GROUP BY type_name
       |ORDER BY obj_count DESC, type_name
       |LIMIT 10""".stripMargin) { (s, _) =>
    analysis(s).topTypes(10).get
  }

  /** B4: byte-array size histogram. */
  val qHeapHistogram: GateQuery = GateQuery(
    "q_heap_byte_histogram",
    s"""SELECT CASE WHEN len(values) < 100 THEN '0-99'
       |            WHEN len(values) < 1000 THEN '100-999'
       |            WHEN len(values) < 10000 THEN '1K-10K'
       |            WHEN len(values) < 100000 THEN '10K-100K'
       |            ELSE '100K+' END AS bucket,
       |  COUNT(*) AS count,
       |  round(CAST(SUM(len(values)) AS DOUBLE) / 1048576.0, 2) AS total_mb
       |FROM read_parquet('$exportDir/_primitive_arrays_byte/*.parquet')
       |GROUP BY 1
       |ORDER BY total_mb DESC""".stripMargin) { (s, _) =>
    analysis(s).byteArrayDistribution.get
  }

  /** B6-B19: the waste suite as a findings DataFrame. */
  val qHeapWaste: GateQuery = GateQuery.rowsOnly("q_heap_waste") { (s, _) =>
    import s.implicits._
    analysis(s).runWasteAnalysis(maxTier = 3)
      .map(f => (f.checkName, f.tier, f.severity, f.affectedCount, f.estimatedWasteBytes))
      .toDF("check_name", "tier", "severity", "affected_count", "estimated_waste_bytes")
  }

  val all: Seq[GateQuery] = Seq(
    qHeapObjectIndex, qHeapTopTypes, qHeapHistogram, qHeapWaste)
    .map(_.copy(bench = false))
}
