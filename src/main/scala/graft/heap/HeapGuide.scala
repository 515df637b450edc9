package graft.heap

/** Self-documentation surface — the Spark-side analogue of the
  * reference server's guide resources (mcp_server/server.py:76
  * guide_setup, :118 guide_sql_examples, :194 guide_waste_checks): an
  * interactive caller (or agent) can fetch how to ingest a dump, what
  * SQL the tables answer, and what each waste tier checks, without
  * leaving the API.
  */
object HeapGuide {

  /** Markdown name → guide body, the discoverable catalogue. */
  def guides: Map[String, String] = Map(
    "setup" -> setup,
    "sql-examples" -> sqlExamples,
    "waste-checks" -> wasteChecks)

  val setup: String =
    """# Setup Guide
      |
      |## Ingest an HPROF heap dump to Parquet
      |
      |```scala
      |import graft.heap._
      |
      |// parse + export every table (per-class, primitive/object arrays,
      |// _object_index, _gc_roots, _stack_frames/_stack_traces, ...)
      |new HeapDump(spark, "/path/to/heap.hprof").writeParquet("/path/to/out")
      |```
      |
      |Or stream the whole-heap object index without an export:
      |
      |```scala
      |val objects = spark.read.format("hprof").load("/path/to/heap.hprof")
      |// columns: obj_id, kind, type_name, n_bytes, n_elems
      |```
      |
      |## Open an analysis session
      |
      |```scala
      |val sessions = new HeapSessions(spark)
      |val s = sessions.open("/path/to/out", "mydump")
      |sessions.query("mydump", "SELECT COUNT(*) FROM _object_index")
      |sessions.queryPage("mydump", "SELECT * FROM _object_index", limit = 100)
      |println(sessions.analyze("mydump", maxTier = 2)) // waste checks as JSON
      |```
      |
      |The CLI equivalents: `count-records`, `dump-objects`, `analyze-json`
      |(see graft.heap.HeapCli).
      |
      |## Reference-graph analytics (also inside `analyze` reports)
      |
      |```scala
      |val an = new HeapAnalysis(new HeapTables(spark, "/path/to/out"))
      |an.referrerStats.foreach(_.show())     // who shares an object (in-degree census)
      |an.ownershipCollapse().foreach(_.show()) // unique-owner chains collapsed
      |an.retainedSize().foreach(_.show())    // dominator-approximate retained bytes
      |an.retainedMatrix().foreach(_.show())  // retained bytes by (root type, owned type)
      |an.rootReachability().foreach(_.show()) // hop distance from GC roots per type
      |an.rootPathExemplars().foreach(_.show()) // concrete root→object exemplar paths
      |```
      |
      |## What grew? Diff two dumps of the same process
      |
      |```scala
      |// take a dump, wait, take another; diff their exports per type
      |val s0 = sessions.open("/path/to/out_t0", "dump_t0")
      |val s1 = sessions.open("/path/to/out_t1", "dump_t1")
      |sessions.diff("dump_t0", "dump_t1").show() // biggest growth first
      |// HTTP: POST /diff {"session_before":"dump_t0","session_after":"dump_t1"}
      |// CLI:  diff /path/to/out_t0 /path/to/out_t1
      |```
      |""".stripMargin

  val sqlExamples: String =
    """# SQL Examples for session queries
      |
      |All queries are Spark SQL over a session's registered views (bare
      |table names address the session passed to `query`). Class tables
      |are named like `java_lang_String`; system tables keep their
      |underscore names.
      |
      |## Top types by object count
      |```sql
      |SELECT type_name, COUNT(*) AS cnt
      |FROM _object_index
      |GROUP BY type_name ORDER BY cnt DESC LIMIT 20
      |```
      |
      |## Look up what type an object ID belongs to
      |```sql
      |SELECT * FROM _object_index WHERE obj_id = 12345678
      |```
      |
      |## Thread stack analysis
      |```sql
      |SELECT sf.class_name, sf.method_name, COUNT(*) AS appearances
      |FROM (SELECT explode(frame_ids) AS fid FROM _stack_traces) t
      |JOIN _stack_frames sf ON sf.frame_id = t.fid
      |GROUP BY sf.class_name, sf.method_name
      |ORDER BY appearances DESC LIMIT 10
      |```
      |
      |## Duplicate strings with waste estimate
      |```sql
      |WITH str_bytes AS (
      |  SELECT s.obj_id, md5(CAST(b.values AS STRING)) AS hash,
      |         size(b.values) AS len
      |  FROM java_lang_String s
      |  JOIN _primitive_arrays_byte b ON s.value = b.obj_id)
      |SELECT hash, COUNT(*) AS dups, MIN(len) AS str_len
      |FROM str_bytes GROUP BY hash HAVING COUNT(*) > 1
      |ORDER BY dups * str_len DESC LIMIT 20
      |```
      |
      |## GC roots by type
      |```sql
      |SELECT root_type, COUNT(*) AS cnt
      |FROM _gc_roots GROUP BY root_type ORDER BY cnt DESC
      |```
      |
      |## Class hierarchy (find subclasses)
      |```sql
      |SELECT * FROM _class_hierarchy
      |WHERE super_class_name = 'java.util.AbstractMap'
      |```
      |
      |## Classloader leaks: class names defined by multiple loaders
      |```sql
      |SELECT class_name, COUNT(*) AS n_copies,
      |       COUNT(DISTINCT loader_obj_id) AS n_loaders
      |FROM _class_hierarchy
      |GROUP BY class_name HAVING COUNT(*) > 1
      |ORDER BY n_copies DESC
      |```
      |
      |## Shared objects: reference-graph in-degree census
      |```sql
      |WITH refs AS (
      |  SELECT s.value AS dst FROM java_lang_String s WHERE s.value != 0
      |  UNION ALL
      |  SELECT explode(elements) AS dst FROM _object_arrays)
      |SELECT idx.type_name, COUNT(*) AS n_refs,
      |       COUNT(DISTINCT refs.dst) AS n_referenced
      |FROM refs JOIN _object_index idx ON idx.obj_id = refs.dst
      |GROUP BY idx.type_name ORDER BY n_refs DESC LIMIT 20
      |```
      |
      |## Join instance fields to the object index for type resolution
      |```sql
      |SELECT i.*, idx.type_name AS ref_type
      |FROM com_example_MyClass i
      |JOIN _object_index idx ON i.some_ref_field = idx.obj_id
      |LIMIT 20
      |```
      |""".stripMargin

  val wasteChecks: String =
    """# Waste Analysis Checks
      |
      |`HeapAnalysis.runWasteAnalysis(maxTier)` (and `HeapSessions
      |.analyze`) run the checks below; higher tiers include all
      |lower-tier checks.
      |
      || Tier | Check | What It Detects |
      ||------|-------|-----------------|
      || 1 | Duplicate Strings | Strings with identical byte[] content |
      || 1 | Bad Collections | Empty/single-element HashMap, ArrayList, LinkedList, TreeMap, ConcurrentHashMap |
      || 1 | Bad Object Arrays | Zero-length, all-null, single-element, sparse (>70% null) |
      || 1 | Bad Primitive Arrays | Zero-length, all-zero, single-element across all 8 primitive types |
      || 1 | Boxed Primitives | Integer, Long, Double, etc. wrapper overhead |
      || 2 | Collection Sizing | Sparse HashMaps (<33% utilized), oversized ArrayList backing arrays |
      || 2 | Duplicate byte[] | Identical byte arrays (MD5 hash, arrays <=10KB) |
      || 2 | Class Count | >20K classes suggests classloader leak |
      || 2 | GC Roots | Root type breakdown (thread bloat, JNI leaks) |
      || 2 | DirectByteBuffer | Off-heap capacity, empty buffers |
      || 2 | Thread Stacks | Thread count and stack depth analysis |
      || 3 | Duplicate Object Arrays | Same elements in same order |
      || 3 | Estimated Shallow Size | Approximate heap usage by type |
      |
      |## Severity levels
      |
      |Severity is based on estimated waste bytes:
      |- **CRITICAL**: >100 MB
      |- **HIGH**: >10 MB
      |- **MEDIUM**: >1 MB
      |- **LOW**: >100 KB
      |- **INFO**: <=100 KB
      |
      |## Recommendations
      |
      |- Start with `maxTier = 1` for a fast scan (5 checks)
      |- Use `maxTier = 2` (default) for a thorough analysis (11 checks)
      |- Use `maxTier = 3` only when you need the expensive checks
      |  (13 checks, slower on large heaps)
      |""".stripMargin
}
