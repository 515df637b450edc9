package graft.heap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resolves the tables of an exported heap-parquet directory — the
  * Spark counterpart of the reference's ParquetResolver
  * (analyze_heap_parquet.py:92): system tables by name, class tables
  * by `<class>_<id>` prefix (all loader copies unioned).
  */
final class HeapTables(spark: SparkSession, dir: String) {
  private val entries: Seq[String] = {
    val f = new java.io.File(dir)
    Option(f.listFiles()).map(_.toSeq.filter(_.isDirectory).map(_.getName)).getOrElse(Nil)
  }

  def system(name: String): Option[DataFrame] =
    if (entries.contains(name)) Some(spark.read.parquet(s"$dir/$name")) else None

  /** All exported tables with file counts and bytes (the reference's
    * list_parquet_files tool).
    */
  def list: DataFrame = {
    import spark.implicits._
    entries.sorted.map { e =>
      val files = Option(new java.io.File(s"$dir/$e").listFiles())
        .map(_.filter(_.getName.endsWith(".parquet"))).getOrElse(Array.empty)
      (e, files.length, files.map(_.length()).sum)
    }.toDF("table", "n_files", "bytes")
  }

  /** Non-robo view: resolve a bare reference column to STRUCT{id,type}
    * via a lazy join against _object_index (SURVEY.md §3 — strictly
    * better at scale than materializing a type string per cell; the
    * index side broadcasts when small, shuffles on obj_id otherwise).
    */
  def withResolvedRef(df: DataFrame, refCol: String): DataFrame =
    system("_object_index") match {
      case None => df
      case Some(oi) => HeapTables.resolveRef(df, refCol, oi)
    }

  def byClass(className: String): Option[DataFrame] = {
    val prefix = className + "_"
    val dirs = entries.filter(e => e.startsWith(prefix) &&
      e.substring(prefix.length).forall(_.isDigit))
    if (dirs.isEmpty) None
    else Some(dirs.map(d => spark.read.parquet(s"$dir/$d")).reduce(_ unionByName _))
  }
}

object HeapTables {
  import org.apache.spark.sql.functions._

  /** Rewrite a bare-long reference column as STRUCT{id,type} by
    * joining the object index (null id 0 → "null"; dangling →
    * "(unresolved)").
    */
  def resolveRef(df: DataFrame, refCol: String, objectIndex: DataFrame): DataFrame =
    df.join(objectIndex.select(col("obj_id").as(s"__ref_$refCol"), col("type_name")),
        df(refCol) === col(s"__ref_$refCol"), "left")
      .withColumn(refCol, struct(df(refCol).as("id"),
        coalesce(
          when(df(refCol) === 0, "null").otherwise(col("type_name")),
          lit("(unresolved)")).as("type")))
      .drop(s"__ref_$refCol", "type_name")
}

/** One waste-analysis finding (reference WasteFinding,
  * analyze_heap_parquet.py:53).
  */
final case class WasteFinding(
    checkName: String, tier: Int, severity: String,
    affectedCount: Long, estimatedWasteBytes: Long,
    details: String, recommendation: String,
    subFindings: Seq[String] = Nil) {
  def severityRank: Int =
    Seq("CRITICAL", "HIGH", "MEDIUM", "LOW", "INFO").indexOf(severity) match {
      case -1 => 5; case r => r
    }
}

/** Heap report queries and the 13-check waste-detection suite
  * (SURVEY.md §2.B) as DataFrame programs over an exported heap
  * directory. Every check is a distributed scan/join/aggregate that
  * collects only its final one-row rollup — no object-level data ever
  * reaches the driver, so the same programs run against a 100 TB
  * export unchanged.
  *
  * Waste constants are public 64-bit-JVM layout facts (compressed
  * oops), matching analyze_heap_parquet.py:36-47.
  */
final class HeapAnalysis(t: HeapTables) {
  import HeapAnalysis._

  // -- B1-B5: report queries ------------------------------------------

  def summary: Option[DataFrame] = t.system("_object_index").map(
    _.agg(count(lit(1)).as("total_objects"),
      countDistinct(col("type_name")).as("unique_classes")))

  def topTypes(limit: Int = 30): Option[DataFrame] = t.system("_object_index").map(
    _.groupBy("type_name").agg(count(lit(1)).as("obj_count"))
      .orderBy(col("obj_count").desc, col("type_name")).limit(limit))

  def categoryBreakdown: Option[DataFrame] = t.system("_object_index").map { oi =>
    val cat = when(col("type_name").like("%kafka%") || col("type_name").like("%Kafka%"), "Kafka")
      .when(col("type_name").like("%MBean%") || col("type_name").like("%javax.management%") ||
        col("type_name").like("%jmx%"), "JMX/MBeans")
      .when(col("type_name").like("%netty%") || col("type_name").like("%Netty%"), "Netty")
      .when(col("type_name").like("%rocksdb%") || col("type_name").like("%RocksDB%"), "RocksDB")
      .when(col("type_name").like("%grpc%") || col("type_name").like("%Grpc%"), "gRPC")
      .when(col("type_name").like("%guava%") || col("type_name").like("%google.common%"), "Guava")
      .when(col("type_name").like("java.%") || col("type_name").like("sun.%") ||
        col("type_name").like("jdk.%"), "JDK")
      .otherwise("Other")
    oi.groupBy(cat.as("category")).agg(count(lit(1)).as("obj_count"))
      .orderBy(col("obj_count").desc)
  }

  def byteArrayDistribution: Option[DataFrame] = t.system("_primitive_arrays_byte").map { b =>
    val n = size(col("values"))
    val bucket = when(n < 100, "0-99").when(n < 1000, "100-999")
      .when(n < 10000, "1K-10K").when(n < 100000, "10K-100K").otherwise("100K+")
    b.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("count"),
        round(sum(n) / 1048576.0, 2).as("total_mb"))
      .orderBy(col("total_mb").desc)
  }

  def largeByteArrays(minBytes: Int = 102400, limit: Int = 20): Option[DataFrame] =
    t.system("_primitive_arrays_byte").map { b =>
      b.select(col("obj_id"), size(col("values")).as("size_bytes"),
          round(size(col("values")) / 1024.0, 1).as("size_kb"))
        .filter(col("size_bytes") > minBytes)
        .orderBy(col("size_bytes").desc).limit(limit)
    }

  // -- B6: duplicate strings ------------------------------------------

  /** Join String→byte[], hash content, roll up duplicate waste. At
    * 100 TB only (hash, len) pairs shuffle — never payloads; sampling
    * knob mirrors the reference's USING SAMPLE for >5M strings.
    */
  def checkDuplicateStrings(samplePct: Double = 100.0): Option[WasteFinding] =
    for {
      strs0 <- t.byClass("java.lang.String")
      bytes <- t.system("_primitive_arrays_byte")
    } yield {
      val strs = if (samplePct < 100) strs0.sample(samplePct / 100.0, 42L) else strs0
      val scale = if (samplePct < 100) 100.0 / samplePct else 1.0
      val joined = strs.select(col("value").as("byte_id"))
        .filter(col("byte_id") =!= 0)
        .join(bytes, col("byte_id") === bytes("obj_id"))
        .select(md5(col("values").cast("string").cast("binary")).as("hash"),
          size(col("values")).as("str_len"))
      val dups = joined.groupBy("hash")
        .agg(count(lit(1)).as("dup_count"), min("str_len").as("str_len"))
        .filter(col("dup_count") > 1)
      val r = dups.agg(
        coalesce(sum("dup_count"), lit(0L)).as("total"),
        coalesce(sum((col("dup_count") - 1) * col("str_len")), lit(0L)).as("wasted"),
        count(lit(1)).as("uniq"),
        coalesce(max("dup_count"), lit(0L)).as("worst")).collect()(0)
      val total = (r.getAs[Long]("total") * scale).toLong
      val uniq = (r.getAs[Long]("uniq") * scale).toLong
      val wasted = (r.getAs[Long]("wasted") * scale).toLong +
        (total - uniq) * StringObjOverhead
      WasteFinding("Duplicate Strings", 1, classifySeverity(wasted), total, wasted,
        s"$total duplicate strings across $uniq unique values (worst: ${(r.getAs[Long]("worst") * scale).toLong} copies)",
        "Intern frequently duplicated strings or use a string deduplication agent (-XX:+UseStringDeduplication with G1)")
    }

  /** Decoded java.lang.String contents: join String.value → byte[]
    * and decode by the `coder` field when present (0 = Latin-1,
    * 1 = UTF-16LE; compact strings, JDK 9+) else Latin-1.
    */
  def stringValues: Option[DataFrame] =
    for {
      strs <- t.byClass("java.lang.String")
      bytes <- t.system("_primitive_arrays_byte")
    } yield {
      val decode = udf { (vals: Seq[Byte], coder: Int) =>
        val arr = vals.toArray
        if (coder == 1) new String(arr, java.nio.charset.StandardCharsets.UTF_16LE)
        else new String(arr, java.nio.charset.StandardCharsets.ISO_8859_1)
      }
      val coder = if (strs.columns.contains("coder")) col("coder").cast("int") else lit(0)
      strs.select(col("obj_id"), col("value").as("byte_id"), coder.as("__coder"))
        .filter(col("byte_id") =!= 0)
        .join(bytes.select(col("obj_id").as("byte_id"), col("values")), "byte_id")
        .select(col("obj_id"), decode(col("values"), col("__coder")).as("text"))
    }

  // -- B7: bad collections --------------------------------------------

  private def emptySingle(df: DataFrame, sizeCol: String): (Long, Long) = {
    val r = df.agg(
      count(when(col(sizeCol) === 0, 1)).as("empty"),
      count(when(col(sizeCol) === 1, 1)).as("single")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  def checkBadCollections(): Option[WasteFinding] = {
    val perType = Seq(
      ("HashMap", t.byClass("java.util.HashMap"), "size",
        (e: Long, s: Long) => e * (HashMapShell + ArrayHeader + 16 * RefSize) +
          s * (HashMapShell + ArrayHeader + 16 * RefSize + HashMapEntry - 2 * RefSize)),
      ("ArrayList", t.byClass("java.util.ArrayList"), "size",
        (e: Long, s: Long) => e * (ArrayListShell + ArrayHeader + 10 * RefSize) +
          s * (ArrayListShell + ArrayHeader + 10 * RefSize - RefSize)),
      ("LinkedList", t.byClass("java.util.LinkedList"), "size",
        (e: Long, s: Long) => e * LinkedListShell + s * (LinkedListShell + LinkedListNode - RefSize)),
      ("TreeMap", t.byClass("java.util.TreeMap"), "size",
        (e: Long, s: Long) => e * 64L + s * (64L + TreeMapEntry - 2 * RefSize)),
      ("ConcurrentHashMap", t.byClass("java.util.concurrent.ConcurrentHashMap"), "baseCount",
        (e: Long, s: Long) => e * (ChmShell + ArrayHeader + 16 * RefSize) +
          s * (ChmShell + ArrayHeader + 16 * RefSize + ChmNode - 2 * RefSize)))
    val found = perType.flatMap { case (name, dfOpt, sizeCol, wasteFn) =>
      dfOpt.filter(_.columns.contains(sizeCol)).flatMap { df =>
        val (e, s) = emptySingle(df, sizeCol)
        if (e + s > 0) Some((name, e, s, wasteFn(e, s))) else None
      }
    }
    if (found.isEmpty) None else {
      val (empty, single, waste) = (found.map(_._2).sum, found.map(_._3).sum, found.map(_._4).sum)
      Some(WasteFinding("Bad Collections (empty/single-element)", 1,
        classifySeverity(waste), empty + single, waste,
        s"$empty empty + $single single-element collections",
        "Replace empty collections with Collections.emptyMap/List/Set(); single-element with Collections.singletonMap/List/Set() or direct fields",
        found.map { case (n, e, s, w) => s"  $n: $e empty, $s single-element (${formatBytes(w)})" }))
    }
  }

  // -- B8: bad object arrays ------------------------------------------

  def checkBadObjectArrays(): Option[WasteFinding] = t.system("_object_arrays").flatMap { oa =>
    val n = size(col("elements"))
    val nulls = size(filter(col("elements"), e => e === 0))
    val pattern = when(n === 0, "zero_length")
      .when(nulls === n, "all_null")
      .when(n === 1, "single_element")
      .when(n > 3 && nulls.cast("double") / n.cast("double") > 0.7, "sparse")
    val rows = oa.select(pattern.as("pattern"), n.as("n"))
      .filter(col("pattern").isNotNull)
      .groupBy("pattern")
      .agg(count(lit(1)).as("count"), sum("n").as("total_slots"))
      .collect()
    if (rows.isEmpty) None else {
      var totalCount = 0L; var totalWaste = 0L
      val sub = rows.toSeq.map { r =>
        val (pat, cnt, slots) = (r.getString(0), r.getLong(1), r.getLong(2))
        totalCount += cnt
        val (waste, desc) = pat match {
          case "zero_length" => (cnt * ArrayHeader, s"  Zero-length: $cnt arrays")
          case "all_null" => (cnt * ArrayHeader + slots * RefSize, s"  All-null: $cnt arrays, $slots null slots")
          case "single_element" => (cnt * (ArrayHeader - RefSize), s"  Single-element: $cnt arrays")
          case _ => ((slots * 0.7).toLong * RefSize, s"  Sparse (>70% null): $cnt arrays")
        }
        totalWaste += waste
        s"$desc (${formatBytes(waste)})"
      }
      Some(WasteFinding("Bad Object Arrays", 1, classifySeverity(totalWaste),
        totalCount, totalWaste, s"$totalCount wasteful object arrays",
        "Use empty array constants (EMPTY_ARRAY), replace single-element arrays with direct references, compact sparse arrays",
        sub))
    }
  }

  // -- B9: bad primitive arrays ---------------------------------------

  def checkBadPrimitiveArrays(): Option[WasteFinding] = {
    val primTypes = Seq(("boolean", 1), ("byte", 1), ("char", 2), ("short", 2),
      ("int", 4), ("long", 8), ("float", 4), ("double", 8))
    val perType = primTypes.flatMap { case (pt, elemSize) =>
      t.system(s"_primitive_arrays_$pt").flatMap { df =>
        val n = size(col("values"))
        val allZero = if (pt == "boolean") !array_contains(col("values"), true)
          else array_min(col("values")) === 0 && array_max(col("values")) === 0
        val pattern = when(n === 0, "zero_length").when(n === 1, "single")
          .when(n > 1 && allZero, "all_zero")
        val rows = df.select(pattern.as("pattern"), (n * elemSize).as("bytes"))
          .filter(col("pattern").isNotNull)
          .groupBy("pattern").agg(count(lit(1)).as("count"), sum("bytes").as("data_bytes"))
          .collect()
        var cnt = 0L; var waste = 0L
        rows.foreach { r =>
          val c = r.getLong(1); val data = r.getLong(2)
          cnt += c
          waste += (r.getString(0) match {
            case "zero_length" => c * ArrayHeader
            case "all_zero" => data + c * ArrayHeader
            case _ => c * (ArrayHeader - elemSize)
          })
        }
        if (cnt > 0) Some((pt, cnt, waste)) else None
      }
    }
    if (perType.isEmpty) None else {
      val (cnt, waste) = (perType.map(_._2).sum, perType.map(_._3).sum)
      Some(WasteFinding("Bad Primitive Arrays", 1, classifySeverity(waste), cnt, waste,
        s"$cnt wasteful primitive arrays (zero-length, single, all-zero)",
        "Replace zero-length with shared constants, avoid single-element arrays where a scalar field suffices, check all-zero arrays for uninitialized buffers",
        perType.map { case (pt, c, w) => s"  $pt[]: $c wasteful (${formatBytes(w)})" }))
    }
  }

  // -- B10: boxed primitives ------------------------------------------

  def checkBoxedNumbers(): Option[WasteFinding] = {
    val wrappers = Seq("Integer", "Long", "Short", "Byte", "Float", "Double", "Boolean", "Character")
    val perType = wrappers.flatMap { w =>
      t.byClass(s"java.lang.$w").flatMap { df =>
        val cnt = df.count()
        if (cnt > 0) Some((w, cnt, cnt * ObjectHeader)) else None
      }
    }
    if (perType.isEmpty) None else {
      val (cnt, waste) = (perType.map(_._2).sum, perType.map(_._3).sum)
      Some(WasteFinding("Boxed Primitives", 1, classifySeverity(waste), cnt, waste,
        s"$cnt boxed primitives (16-byte overhead each vs raw primitive)",
        "Use primitive types directly, IntArrayList/LongArrayList from fastutil/Eclipse Collections instead of List<Integer>/List<Long>",
        perType.map { case (w, c, b) => s"  $w: $c (${formatBytes(b)})" }))
    }
  }

  // -- B11: collection sizing -----------------------------------------

  def checkCollectionSizing(): Option[WasteFinding] = {
    val oaOpt = t.system("_object_arrays")
    val sub = scala.collection.mutable.ArrayBuffer.empty[String]
    var cnt = 0L; var waste = 0L
    for (hm <- t.byClass("java.util.HashMap"); oa <- oaOpt
         if hm.columns.contains("size") && hm.columns.contains("table")) {
      val r = hm.filter(col("size") >= 2 && col("table") =!= 0)
        .select(col("size"), col("table").as("table_id"))
        .join(oa, col("table_id") === oa("obj_id"))
        .select(col("size"), size(col("elements")).as("cap"))
        .filter(col("cap") >= 16 && col("size").cast("double") / col("cap").cast("double") < 0.33)
        .agg(count(lit(1)).as("count"),
          coalesce(sum(col("cap") * RefSize), lit(0L)).as("wasted"),
          avg(col("size").cast("double") / col("cap").cast("double")).as("avg_util"))
        .collect()(0)
      if (r.getLong(0) > 0) {
        cnt += r.getLong(0); waste += r.getLong(1)
        sub += f"  Sparse HashMaps (<33%% full, >=16 slots): ${r.getLong(0)} (avg util: ${r.getDouble(2) * 100}%.1f%%, wasted slots: ${formatBytes(r.getLong(1))})"
      }
    }
    for (al <- t.byClass("java.util.ArrayList"); oa <- oaOpt
         if al.columns.contains("size") && al.columns.contains("elementData")) {
      val r = al.filter(col("size") >= 1 && col("elementData") =!= 0)
        .select(col("size"), col("elementData").as("arr_id"))
        .join(oa, col("arr_id") === oa("obj_id"))
        .select(col("size"), size(col("elements")).as("cap"))
        .filter(col("cap") > col("size") * 2 && col("cap") - col("size") > 8)
        .agg(count(lit(1)).as("count"),
          coalesce(sum((col("cap") - col("size")) * RefSize), lit(0L)).as("wasted"))
        .collect()(0)
      if (r.getLong(0) > 0) {
        cnt += r.getLong(0); waste += r.getLong(1)
        sub += s"  Oversized ArrayList backing arrays (>2x needed, >8 spare): ${r.getLong(0)} (${formatBytes(r.getLong(1))})"
      }
    }
    if (cnt == 0) None else Some(WasteFinding("Collection Sizing Issues", 2,
      classifySeverity(waste), cnt, waste, s"$cnt poorly-sized collections",
      "Use initial capacity hints: new HashMap<>(expectedSize) or new ArrayList<>(expectedSize); call trimToSize() after bulk adds",
      sub.toSeq))
  }

  // -- B12: duplicate byte arrays -------------------------------------

  private def duplicateArrays(df: DataFrame, lenCond: Column => Column,
      elemCol: String, elemSize: Int): (Long, Long, Long) = {
    val n = size(col(elemCol))
    val r = df.filter(lenCond(n))
      .select(md5(col(elemCol).cast("string").cast("binary")).as("hash"), n.as("len"))
      .groupBy("hash")
      .agg(count(lit(1)).as("dup_count"), min("len").as("len"))
      .filter(col("dup_count") > 1)
      .agg(coalesce(sum("dup_count"), lit(0L)).as("total"),
        coalesce(sum((col("dup_count") - 1) * col("len") * elemSize), lit(0L)).as("wasted"),
        count(lit(1)).as("uniq"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  def checkDuplicateByteArrays(): Option[WasteFinding] =
    t.system("_primitive_arrays_byte").flatMap { b =>
      val (total, wasted0, uniq) = duplicateArrays(b, n => n > 0 && n <= 10240, "values", 1)
      if (total == 0) None else {
        val wasted = wasted0 + (total - uniq) * ArrayHeader
        Some(WasteFinding("Duplicate byte[] Arrays", 2, classifySeverity(wasted), total, wasted,
          s"$total duplicate byte arrays across $uniq unique values (arrays <=10KB)",
          "Cache/intern frequently reused byte arrays; check for serialization producing identical buffers"))
      }
    }

  // -- B13: class count -----------------------------------------------

  def checkClassCount(): Option[WasteFinding] = t.system("_object_index").flatMap { oi =>
    val cnt = oi.agg(countDistinct(col("type_name"))).collect()(0).getLong(0)
    if (cnt < 10000) None else {
      val severity = if (cnt > 50000) "HIGH" else if (cnt > 20000) "MEDIUM" else "INFO"
      Some(WasteFinding("Class Count / Leak Detection", 2, severity, cnt, cnt * 8192L,
        s"$cnt unique classes loaded",
        "If >20K, investigate classloader leaks (hot-deploy, OSGi, reflection-generated classes). Check for lambda/proxy class proliferation."))
    }
  }

  // -- B14: GC roots ---------------------------------------------------

  def checkGcRoots(): Option[WasteFinding] = t.system("_gc_roots").flatMap { gr =>
    val rows = gr.groupBy("root_type").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc).collect()
    if (rows.isEmpty) None else {
      val total = rows.map(_.getLong(1)).sum
      val severity = if (total > 100000) "MEDIUM" else if (total > 50000) "LOW" else "INFO"
      Some(WasteFinding("GC Roots Breakdown", 2, severity, total, 0L,
        s"$total GC roots across ${rows.length} root types",
        "High JavaStackFrame roots may indicate thread bloat. High JNI roots may indicate native resource leaks.",
        rows.toSeq.map(r => s"  ${r.getString(0)}: ${r.getLong(1)}")))
    }
  }

  // -- B15: DirectByteBuffer ------------------------------------------

  def checkDirectByteBuffers(): Option[WasteFinding] =
    t.byClass("java.nio.DirectByteBuffer").flatMap { db =>
      if (!db.columns.contains("capacity")) None else {
        val r = db.agg(
          count(lit(1)).as("count"),
          coalesce(sum("capacity"), lit(0L)).as("total_cap"),
          coalesce(sum(when(col("position") === 0 && col("limit") === col("capacity"),
            col("capacity")).otherwise(0)), lit(0L)).as("untouched"),
          count(when(col("capacity") === 0, 1)).as("empty"),
          coalesce(max("capacity"), lit(0)).as("max_cap"),
          coalesce(avg("capacity"), lit(0.0)).as("avg_cap")).collect()(0)
        val cnt = r.getAs[Long]("count")
        if (cnt == 0) None else {
          val totalCap = r.getAs[Long]("total_cap")
          val untouched = r.getAs[Long]("untouched")
          val empty = r.getAs[Long]("empty")
          val waste = empty * 64L + untouched
          Some(WasteFinding("DirectByteBuffer Off-Heap", 2,
            if (totalCap > 10L * 1024 * 1024) classifySeverity(totalCap) else "INFO",
            cnt, waste,
            s"$cnt DirectByteBuffers, ${formatBytes(totalCap)} total off-heap capacity",
            "Release unused DirectByteBuffers explicitly (sun.misc.Cleaner). Consider pooling for short-lived buffers.",
            Seq(s"  Total buffers: $cnt",
              s"  Total capacity: ${formatBytes(totalCap)} (off-heap)",
              s"  Empty buffers: $empty",
              s"  Max single buffer: ${formatBytes(r.getAs[Number]("max_cap").longValue())}",
              s"  Avg buffer size: ${formatBytes(r.getAs[Double]("avg_cap").toLong)}")))
        }
      }
    }

  // -- B16: thread stacks ---------------------------------------------

  def checkThreadStacks(): Option[WasteFinding] = t.system("_stack_traces").flatMap { traces =>
    val traceCount = traces.count()
    if (traceCount == 0) None else {
      val sub = scala.collection.mutable.ArrayBuffer.empty[String]
      var alive = 0L; var totalThreads = 0L
      t.byClass("java.lang.Thread").filter(_.columns.contains("threadStatus")).foreach { th =>
        val statusRows = th.groupBy("threadStatus").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc).collect()
        val decoded = statusRows.map { r =>
          val s = r.getAs[Number](0).intValue(); val c = r.getLong(1)
          totalThreads += c
          val flags = if (s == 0) Seq("NEW") else Seq(
            0x0001 -> "ALIVE", 0x0002 -> "TERMINATED", 0x0004 -> "RUNNABLE",
            0x0010 -> "WAITING", 0x0020 -> "TIMED_WAITING", 0x0080 -> "SLEEPING",
            0x0100 -> "IN_OBJECT_WAIT", 0x0200 -> "PARKED", 0x0400 -> "BLOCKED")
            .collect { case (bit, nm) if (s & bit) != 0 => nm }
          if (s != 0 && (s & 0x0001) != 0 && (s & 0x0002) == 0) alive += c
          (if (flags.nonEmpty) flags.mkString("|") else s"UNKNOWN($s)") -> c
        }
        sub += s"java.lang.Thread instances: $totalThreads (alive: $alive, terminated: ${totalThreads - alive})"
        sub += s"HPROF stack trace records: $traceCount"
        sub += "Thread status breakdown:"
        decoded.foreach { case (st, c) => sub += f"  $c%6d  $st" }
      }
      if (totalThreads == 0) sub += s"HPROF stack trace records: $traceCount"

      val depth = size(col("frame_ids"))
      val bucket = when(depth === 0, "0 (empty)").when(depth <= 5, "1-5")
        .when(depth <= 20, "6-20").when(depth <= 50, "21-50").otherwise("50+")
      val depthRows = traces.groupBy(bucket.as("depth_bucket"))
        .agg(count(lit(1)).as("cnt")).orderBy(col("cnt").desc).collect()
      if (depthRows.nonEmpty) {
        sub += "Stack depth distribution:"
        depthRows.foreach(r => sub += f"  ${r.getString(0)}%12s: ${r.getLong(1)}")
      }
      t.system("_stack_frames").foreach { frames =>
        val pool = frames.filter(col("class_name").like("%Thread%") ||
            col("class_name").like("%Pool%") || col("class_name").like("%Executor%") ||
            col("class_name").like("%Worker%"))
          .groupBy("class_name").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc).limit(10).collect()
        if (pool.nonEmpty) {
          sub += "Top thread-related classes in frames:"
          pool.foreach(r => sub += f"  ${r.getLong(1)}%6d  ${r.getString(0)}")
        }
      }
      val effective = if (alive > 0) alive else traceCount
      val severity = if (effective > 5000) "CRITICAL" else if (effective > 2000) "HIGH"
        else if (effective > 1000) "MEDIUM" else "INFO"
      Some(WasteFinding("Thread Stacks", 2, severity, effective, effective * 512L * 1024,
        s"$effective alive threads" + (if (totalThreads > 0)
          s" ($totalThreads total Thread instances, ${totalThreads - alive} terminated)" else "") +
          ". Classloader leak threshold is typically >1000.",
        "High thread counts increase memory overhead (~512KB stack per thread) and GC pressure. Check for thread pool over-provisioning or unbounded thread creation.",
        sub.toSeq))
    }
  }

  // -- B17: duplicate object arrays -----------------------------------

  def checkDuplicateObjectArrays(): Option[WasteFinding] =
    t.system("_object_arrays").flatMap { oa =>
      val (total, wasted0, uniq) = duplicateArrays(oa, n => n.between(1, 100), "elements", RefSize.toInt)
      if (total == 0) None else {
        val wasted = wasted0 + (total - uniq) * ArrayHeader
        Some(WasteFinding("Duplicate Object Arrays", 3, classifySeverity(wasted), total, wasted,
          s"$total duplicate object arrays across $uniq unique values (arrays 1-100 elements)",
          "Share immutable arrays or use flyweight pattern for identical element sequences"))
      }
    }

  // -- B18: estimated shallow size ------------------------------------

  def checkEstimatedShallowSize(): Option[WasteFinding] = t.system("_object_index").flatMap { oi =>
    val rows = oi.groupBy("type_name").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc).limit(50).collect()
    if (rows.isEmpty) None else {
      val avgObj = ObjectHeader + 32
      val total = rows.map(_.getLong(1)).sum
      val est = rows.map(_.getLong(1) * avgObj).sum
      Some(WasteFinding("Estimated Shallow Size (top 50 types)", 3, "INFO", total, 0L,
        s"Top 50 types estimated at ~${formatBytes(est)} (assuming avg ${avgObj}B per object)",
        "Use -XX:+PrintClassHistogram for exact shallow sizes. This is an approximation.",
        rows.toSeq.take(15).map(r => s"  ${r.getString(0)}: ${r.getLong(1)} (~${formatBytes(r.getLong(1) * avgObj)})")))
    }
  }

  // -- B19: orchestrator ----------------------------------------------

  def runWasteAnalysis(maxTier: Int = 2, samplePct: Double = 100.0): Seq[WasteFinding] = {
    val checks: Seq[(Int, () => Option[WasteFinding])] = Seq(
      1 -> (() => checkDuplicateStrings(samplePct)),
      1 -> (() => checkBadCollections()),
      1 -> (() => checkBadObjectArrays()),
      1 -> (() => checkBadPrimitiveArrays()),
      1 -> (() => checkBoxedNumbers()),
      2 -> (() => checkCollectionSizing()),
      2 -> (() => checkDuplicateByteArrays()),
      2 -> (() => checkClassCount()),
      2 -> (() => checkGcRoots()),
      2 -> (() => checkDirectByteBuffers()),
      2 -> (() => checkThreadStacks()),
      3 -> (() => checkDuplicateObjectArrays()),
      3 -> (() => checkEstimatedShallowSize()))
    checks.filter(_._1 <= maxTier).flatMap(_._2())
      .sortBy(f => (f.severityRank, -f.estimatedWasteBytes))
  }

  /** Structured analysis result with the reference MCP tool's shape
    * (server.py analyze_heap: summary / top_types / categories /
    * byte_array_distribution / large_byte_arrays / waste_findings /
    * total_estimated_waste) as a JSON string — the machine-readable
    * counterpart of renderReport.
    */
  def analyzeJson(topN: Int = 30, waste: Boolean = true, maxTier: Int = 2): String = {
    import graft.Json.{arr => jArr, obj => jObj, str => jStr}
    def dfRows(dfOpt: Option[DataFrame]): String = jArr(
      dfOpt.toSeq.flatMap(df => df.collect().toSeq.map { r =>
        jObj(df.columns.zipWithIndex.map { case (c, i) =>
          c -> (r.get(i) match {
            case null => "null"
            case s: String => jStr(s)
            case v: java.math.BigDecimal => v.toPlainString
            case v => v.toString
          })
        }.toSeq)
      }))
    val base = Seq(
      "summary" -> dfRows(summary),
      "top_types" -> dfRows(topTypes(topN)),
      "categories" -> dfRows(categoryBreakdown),
      "byte_array_distribution" -> dfRows(byteArrayDistribution),
      "large_byte_arrays" -> dfRows(largeByteArrays()))
    val withWaste = if (!waste) base else {
      val findings = runWasteAnalysis(maxTier)
      val total = findings.map(_.estimatedWasteBytes).sum
      base ++ Seq(
        "waste_findings" -> jArr(findings.map(f => jObj(Seq(
          "check_name" -> jStr(f.checkName),
          "tier" -> f.tier.toString,
          "severity" -> jStr(f.severity),
          "affected_count" -> f.affectedCount.toString,
          "estimated_waste_bytes" -> f.estimatedWasteBytes.toString,
          "estimated_waste_human" -> jStr(formatBytes(f.estimatedWasteBytes)),
          "details" -> jStr(f.details),
          "recommendation" -> jStr(f.recommendation),
          "sub_findings" -> jArr(f.subFindings.map(jStr)))))),
        "total_estimated_waste" -> jStr(formatBytes(total)),
        "total_estimated_waste_bytes" -> total.toString)
    }
    jObj(withWaste)
  }

  def renderReport(findings: Seq[WasteFinding]): String = {
    val sb = new StringBuilder
    sb.append("=== HEAP WASTE ANALYSIS ===\n")
    findings.foreach { f =>
      sb.append(f"\n[${f.severity}] ${f.checkName} (tier ${f.tier})\n")
      sb.append(s"  affected: ${f.affectedCount}  est. waste: ${formatBytes(f.estimatedWasteBytes)}\n")
      sb.append(s"  ${f.details}\n")
      f.subFindings.foreach(s => sb.append(s"  $s\n"))
      sb.append(s"  -> ${f.recommendation}\n")
    }
    sb.toString
  }
}

object HeapAnalysis {
  // 64-bit JVM, compressed oops (analyze_heap_parquet.py:36-47)
  val ObjectHeader = 16L
  val ArrayHeader = 16L
  val RefSize = 4L
  val HashMapEntry = 32L
  val HashMapShell = 48L
  val ArrayListShell = 40L
  val LinkedListShell = 48L
  val LinkedListNode = 24L
  val TreeMapEntry = 48L
  val ChmShell = 64L
  val ChmNode = 32L
  val StringObjOverhead = 40L

  def classifySeverity(wasteBytes: Long): String =
    if (wasteBytes > 100L * 1024 * 1024) "CRITICAL"
    else if (wasteBytes > 10L * 1024 * 1024) "HIGH"
    else if (wasteBytes > 1024 * 1024) "MEDIUM"
    else if (wasteBytes > 100 * 1024) "LOW"
    else "INFO"

  def formatBytes(n: Long): String =
    if (n >= 1024L * 1024 * 1024) f"${n / (1024.0 * 1024 * 1024)}%.1f GB"
    else if (n >= 1024 * 1024) f"${n / (1024.0 * 1024)}%.1f MB"
    else if (n >= 1024) f"${n / 1024.0}%.1f KB"
    else s"$n B"
}
