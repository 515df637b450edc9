package graft.heap

import HprofModel._
import HprofParser.{Cursor, SubVisitor}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.reflect.ClassTag

/** Byte-range reads through the Hadoop FileSystem API so the same
  * code path serves file:// in tests and hdfs://;s3:// on a cluster.
  */
object HeapIO {
  def withFs[T](pathStr: String)(f: (FileSystem, Path) => T): T = {
    val p = new Path(pathStr)
    f(p.getFileSystem(new Configuration()), p)
  }

  def fileLength(pathStr: String): Long =
    withFs(pathStr)((fs, p) => fs.getFileStatus(p).getLen)

  def readRange(pathStr: String, offset: Long, length: Int): Array[Byte] =
    withFs(pathStr) { (fs, p) =>
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](length)
        in.readFully(offset, buf)
        buf
      } finally in.close()
    }
}

/** Driver-side metadata index built in pass 1 (SURVEY.md §2.A1-A3):
  * strings, classes, stack frames/traces. Sized by class/method
  * counts, not object counts, so it fits on the driver and broadcasts
  * to executors — same shape as the reference's HprofIndex
  * (hprof_index.rs:34) but the per-object maps are left distributed.
  */
final case class ClassInfo(
    objId: Long, name: String, superId: Long, instanceSize: Int,
    staticFields: Seq[StaticField], ownFields: Seq[FieldDesc],
    layout: Seq[LayoutField], loaderId: Long = 0L)

final class HeapIndex(
    val utf8: Map[Long, String],
    val classes: Map[Long, ClassInfo],
    val stackFrames: Seq[StackFrameRec],
    val stackTraces: Seq[StackTraceRec],
    val classSerialToName: Map[Int, String]) extends Serializable {

  def className(classObjId: Long): String =
    classes.get(classObjId).map(_.name).getOrElse("(unresolved)")

  /** Reference appends "[]" to the array class's name
    * (dump_to_parquet.rs:317); we additionally normalize JVM
    * descriptor-style array class names ("[Ljava.lang.String;").
    */
  def arrayTypeName(arrayClassObjId: Long): String =
    classes.get(arrayClassObjId).map(c => HeapIndex.normalizeArrayName(c.name))
      .getOrElse("(unresolved)[]")
}

object HeapIndex {
  def normalizeArrayName(name: String): String =
    if (name.startsWith("[L") && name.endsWith(";")) name.substring(2, name.length - 1) + "[]"
    else if (name.endsWith("[]")) name
    else name + "[]"

  /** Full-hierarchy instance layout: own fields first, then the super
    * chain (HPROF instance-dump value order). Shadowed names get a
    * `Declaring@name` prefix (reference util.rs:64-86).
    */
  def buildLayout(classId: Long, dumps: Map[Long, ClassDumpInfo],
      names: Map[Long, String], utf8: Map[Long, String]): Seq[LayoutField] = {
    val out = mutable.ArrayBuffer.empty[LayoutField]
    val counts = mutable.Map.empty[String, Int]
    val visited = mutable.Set.empty[Long] // corrupt dumps can cycle
    var cur = classId
    while (cur != 0 && dumps.contains(cur) && visited.add(cur)) {
      val cd = dumps(cur)
      val declaring = names.getOrElse(cur, "(unresolved)")
      val shortDecl = declaring.substring(declaring.lastIndexOf('.') + 1)
      cd.instanceFields.foreach { fd =>
        val base = utf8.getOrElse(fd.nameId, "(missing utf8)")
        val n = counts.getOrElse(base, 0)
        counts(base) = n + 1
        out += LayoutField(if (n == 0) base else s"$shortDecl@$base", fd.typeTag)
      }
      cur = cd.superClassObjId
    }
    out.toSeq
  }
}

/** A parsed HPROF heap dump exposed as Spark DataFrames (SURVEY.md
  * §2.A). Ingestion is two-pass: pass 1 walks record headers
  * sequentially (9 bytes per record) and parses class/string metadata
  * with distributed tasks; pass 2 parses heap segments fully in
  * parallel, keyed by (offset, length) ranges — elastic to cluster
  * size, same shape as the reference's rayon parallelism
  * (dump_to_parquet.rs:193) but not bound to one machine.
  *
  * All reference columns are "robo mode": object references are bare
  * longs; the id→type view is a join against `objectIndex` (SURVEY.md
  * §3 — lazy join beats materializing a string per reference cell).
  */
final class HeapDump(spark: SparkSession, path: String) {
  import HprofModel.Tag

  val header: HprofParser.Header =
    HprofParser.parseHeader(HeapIO.readRange(path, 0L, math.min(64L, HeapIO.fileLength(path)).toInt))
  val idSize: Int = header.idSize

  /** Sequential header walk with ONE open handle (9 bytes + seek per
    * record; a per-record open would cost more than the parse).
    */
  val records: Vector[RecordPtr] = HeapIO.withFs(path) { (fs, p) =>
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try HprofParser.indexRecords((off, n) => {
      val buf = new Array[Byte](n)
      in.readFully(off, buf)
      buf
    }, len, header.bodyStart)
    finally in.close()
  }

  private val segPtrs = records.filter(r => Tag.isHeapSegment(r.tag))

  private def parallelism(n: Int): Int =
    math.max(1, math.min(n, spark.sparkContext.defaultParallelism))

  /** Parse a set of records on executors; `f` runs per record body.
    * One file handle per partition — a per-record open/seek/close
    * would dominate for the many small metadata records (UTF8 etc.).
    */
  private def recordRdd[T: ClassTag](ptrs: Seq[RecordPtr])(f: (RecordPtr, Array[Byte]) => Iterator[T]): RDD[T] = {
    val p = path
    spark.sparkContext.parallelize(ptrs, parallelism(ptrs.size))
      .mapPartitions { it =>
        HeapIO.withFs(p) { (fs, hp) =>
          val in = fs.open(hp)
          try it.flatMap { r =>
            require(r.bodyLength <= Int.MaxValue,
              s"record body ${r.bodyLength} exceeds 2 GiB buffer limit (tag ${r.tag})")
            val buf = new Array[Byte](r.bodyLength.toInt)
            in.readFully(r.bodyOffset, buf)
            f(r, buf)
          }.toVector.iterator
          finally in.close()
        }
      }
  }

  /** Pass 2 workhorse: scan every heap segment with a visitor. */
  private def segmentRdd[T: ClassTag](mk: mutable.ArrayBuffer[T] => SubVisitor): RDD[T] = {
    val idSz = idSize
    recordRdd(segPtrs) { (_, body) =>
      val buf = mutable.ArrayBuffer.empty[T]
      HprofParser.scanSegment(body, idSz, mk(buf))
      buf.iterator
    }
  }

  /** Pass 1: distributed metadata parse, collected to the driver. */
  val index: HeapIndex = {
    val idSz = idSize
    val utf8 = recordRdd(records.filter(_.tag == Tag.Utf8)) { (_, b) =>
      Iterator.single(HprofParser.parseUtf8(b, idSz))
    }.collect().toMap
    val loads = recordRdd(records.filter(_.tag == Tag.LoadClass)) { (_, b) =>
      Iterator.single(HprofParser.parseLoadClass(b, idSz))
    }.collect()
    val frames = recordRdd(records.filter(_.tag == Tag.StackFrame)) { (_, b) =>
      Iterator.single(HprofParser.parseStackFrame(b, idSz))
    }.collect()
    val traces = recordRdd(records.filter(_.tag == Tag.StackTrace)) { (_, b) =>
      Iterator.single(HprofParser.parseStackTrace(b, idSz))
    }.collect()
    val classDumps = segmentRdd[ClassDumpInfo] { buf =>
      new SubVisitor { override def onClassDump(cd: ClassDumpInfo): Unit = buf += cd }
    }.collect()

    val names: Map[Long, String] = loads.map { lc =>
      lc.classObjId -> utf8.getOrElse(lc.nameId, "(missing utf8)").replace('/', '.')
    }.toMap
    val dumpMap = classDumps.map(cd => cd.classObjId -> cd).toMap
    val classes = dumpMap.map { case (cid, cd) =>
      cid -> ClassInfo(cid, names.getOrElse(cid, "(unresolved)"), cd.superClassObjId,
        cd.instanceSize, cd.staticFields, cd.instanceFields,
        HeapIndex.buildLayout(cid, dumpMap, names, utf8), cd.loaderObjId)
    }
    val serialToName = loads.map(lc => lc.serial ->
      utf8.getOrElse(lc.nameId, "(missing utf8)").replace('/', '.')).toMap
    new HeapIndex(utf8, classes, frames.toSeq, traces.toSeq, serialToName)
  }

  private lazy val bcClassNames = spark.sparkContext.broadcast(index.classes.map { case (k, v) => k -> v.name })

  import spark.implicits._

  // -- A12: top-level record tally ------------------------------------
  def countRecords: DataFrame =
    records.groupBy(r => Tag.name(r.tag)).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy(-_._2).toDF("record_type", "count")

  // -- A9: robo-style object index ------------------------------------
  def objectIndex: DataFrame = {
    val names = bcClassNames
    segmentRdd[(Long, String)] { buf =>
      new SubVisitor {
        override def onInstance(ev: InstanceEv): Unit =
          buf += ev.objId -> names.value.getOrElse(ev.classObjId, "(unresolved)")
        override def onPrimArray(ev: PrimArrayEv): Unit =
          buf += ev.objId -> s"${BasicType.javaName(ev.elemType)}[]"
        override def onObjArray(ev: ObjArrayEv): Unit =
          buf += ev.objId -> names.value.get(ev.arrayClassObjId)
            .map(HeapIndex.normalizeArrayName).getOrElse("(unresolved)[]")
        override def onClassDump(cd: ClassDumpInfo): Unit =
          buf += cd.classObjId -> s"class ${names.value.getOrElse(cd.classObjId, "(unresolved)")}"
      }
    }.toDF("obj_id", "type_name")
  }

  // -- A9: class hierarchy (driver-side, tiny) ------------------------
  /** instance_size (the class dump's declared per-instance field
    * bytes) is APPENDED after the original 5-column schema so
    * positional readers of earlier exports keep their prefix.
    */
  def classHierarchy: DataFrame =
    index.classes.values.toSeq.sortBy(_.objId)
      .map { c =>
        val sup = index.classes.get(c.superId)
        (c.objId, c.name,
          if (c.superId == 0) None else Some(c.superId),
          sup.map(_.name), c.loaderId, c.instanceSize)
      }.toDF("class_obj_id", "class_name", "super_class_obj_id",
        "super_class_name", "loader_obj_id", "instance_size")

  // -- A18: per-class field-layout metadata ---------------------------
  /** One row per instance-field slot of every class's FULL layout (own
    * fields then the super chain — the exact decode order of the
    * per-class tables). This is the export-side record of what the
    * parser knew: a robo-mode schema alone cannot tell a long VALUE
    * field from a reference field (both land as BIGINT), so any
    * generic graph analytics over the export — referrer counts,
    * ownership chains — needs `field_type = 'object'` to find the
    * reference columns without hardcoding JDK class shapes.
    */
  def fieldsTable: DataFrame =
    index.classes.values.toSeq.sortBy(_.objId).flatMap { c =>
      c.layout.zipWithIndex.map { case (f, i) =>
        (c.objId, c.name, i, f.name, HprofModel.BasicType.javaName(f.typeTag))
      }
    }.toDF("class_obj_id", "class_name", "slot_idx", "field_name", "field_type")

  // -- A6: object arrays ----------------------------------------------
  def objectArrays: DataFrame = {
    val names = bcClassNames
    segmentRdd[(Long, String, Seq[Long])] { buf =>
      new SubVisitor {
        override def onObjArray(ev: ObjArrayEv): Unit =
          buf += ((ev.objId, names.value.getOrElse(ev.arrayClassObjId, "(unresolved)"), ev.elements))
      }
    }.toDF("obj_id", "class_name", "elements")
  }

  // -- A5: primitive arrays -------------------------------------------
  /** All primitive arrays in one pass (one non-null values column per
    * row). Persist this and derive the 8 typed tables to avoid 8
    * segment re-parses.
    */
  def primitiveArraysAll: DataFrame =
    spark.createDataFrame(segmentRdd[PrimArrayEv] { buf =>
      new SubVisitor { override def onPrimArray(ev: PrimArrayEv): Unit = buf += ev }
    })

  private[heap] val primCols = Map(
    BasicType.Boolean -> "booleans", BasicType.Byte -> "bytes",
    BasicType.Char -> "chars", BasicType.Short -> "shorts",
    BasicType.Int -> "ints", BasicType.Long -> "longs",
    BasicType.Float -> "floats", BasicType.Double -> "doubles")

  def primitiveArrays(typeTag: Int, from: DataFrame = null): DataFrame = {
    val src = if (from == null) primitiveArraysAll else from
    src.filter(src("elemType") === typeTag)
      .select(src("objId").as("obj_id"), src(primCols(typeTag)).as("values"))
  }

  // -- A8: GC roots ---------------------------------------------------
  def gcRoots: DataFrame =
    segmentRdd[GcRootEv] { buf =>
      new SubVisitor { override def onGcRoot(ev: GcRootEv): Unit = buf += ev }
    }.toDF("root_type", "obj_id", "thread_serial", "frame_index")

  // -- A7: static fields (driver-side from class dumps) ---------------
  /** slot_idx = the slot's position in the CLASS DUMP's declaration
    * order — the order `dump-objects` renders statics in, which a
    * reader of the export (the q_heap_render oracle included) cannot
    * otherwise reconstruct from an unordered parquet row set.
    * slot_idx is APPENDED after the reference exporter's 6-column
    * robo schema so positional readers of reference-format exports
    * keep their column prefix (the repo's own readers are by-name).
    */
  def staticFields: DataFrame =
    index.classes.values.toSeq.sortBy(_.objId).flatMap { c =>
      c.staticFields.zipWithIndex.map { case (sf, i) =>
        (c.objId, c.name, index.utf8.getOrElse(sf.nameId, "(missing utf8)"),
          BasicType.javaName(sf.typeTag), sf.primitive, sf.refId, i)
      }
    }.toDF("class_obj_id", "class_name", "field_name",
      "field_type", "primitive_value", "ref_id", "slot_idx")

  // -- A10: stack frames / traces -------------------------------------
  def stackFrames: DataFrame =
    index.stackFrames.map { f =>
      (f.frameId,
        index.classSerialToName.getOrElse(f.classSerial, "(unresolved)"),
        index.utf8.getOrElse(f.methodNameId, "(missing utf8)"),
        index.utf8.getOrElse(f.methodSigId, "(missing utf8)"),
        index.utf8.getOrElse(f.sourceFileId, "(missing utf8)"),
        f.lineNum)
    }.toDF("frame_id", "class_name", "method_name", "method_signature", "source_file", "line_num")

  def stackTraces: DataFrame =
    index.stackTraces.map(t => (t.serial, t.threadSerial, t.frameIds))
      .toDF("stack_trace_serial", "thread_serial", "frame_ids")

  // -- A4: per-class typed instance tables ----------------------------
  private[heap] def instancesEvents: RDD[InstanceEv] =
    segmentRdd[InstanceEv] { buf =>
      new SubVisitor { override def onInstance(ev: InstanceEv): Unit = buf += ev }
    }

  def instancesRaw: DataFrame = spark.createDataFrame(instancesEvents)

  private def sparkType(tag: Int): DataType = tag match {
    case BasicType.Object => LongType
    case BasicType.Boolean => BooleanType
    case BasicType.Char => IntegerType
    case BasicType.Float => FloatType
    case BasicType.Double => DoubleType
    case BasicType.Byte => ByteType
    case BasicType.Short => ShortType
    case BasicType.Int => IntegerType
    case BasicType.Long => LongType
  }

  def instanceSchema(classId: Long): StructType =
    StructType(StructField("obj_id", LongType, nullable = false) +:
      index.classes(classId).layout.map(f => StructField(f.name, sparkType(f.typeTag), nullable = false)))

  /** Typed instance table for one class id; field columns decoded on
    * executors from the raw bytes against the broadcast layout.
    */
  def instances(classId: Long, from: DataFrame = null): DataFrame = {
    val layout = index.classes(classId).layout
    val idSz = idSize
    val src = if (from == null) instancesRaw else from
    val rows = src.filter(src("classObjId") === classId)
      .select("objId", "fields").rdd.map { r =>
        Row.fromSeq(r.getLong(0) +: HprofParser.decodeInstance(r.getAs[Array[Byte]](1), idSz, layout))
      }
    spark.createDataFrame(rows, instanceSchema(classId))
  }

  /** Typed instance table by class name (first matching class id when
    * several loaders define the name — reference writes one file per
    * (name, id) and its analysis globs them together).
    */
  def instancesByName(name: String, from: DataFrame = null): Option[DataFrame] =
    index.classes.values.filter(_.name == name).map(_.objId).toSeq.sorted match {
      case Seq() => None
      case ids => Some(ids.map(id => instances(id, from)).reduce(_ unionByName _))
    }

  // -- A13: human-readable object rendering ---------------------------
  /** Behavior-parallel to the reference's `dump-objects`
    * (dump_objects.rs): classes with their statics, instances with
    * decoded fields, object arrays with element ids, primitive arrays
    * with a value preview. References render as hex ids (robo-style).
    */
  def renderObjects(limit: Int): Seq[String] = {
    val classInfo = index.classes.map { case (k, v) =>
      k -> (v.name, v.layout, v.staticFields.map(sf =>
        (index.utf8.getOrElse(sf.nameId, "(missing utf8)"), sf.typeTag, sf.primitive, sf.refId)))
    }
    val idSz = idSize
    segmentRdd[String] { buf =>
      new SubVisitor {
        override def onInstance(ev: InstanceEv): Unit = buf += (classInfo.get(ev.classObjId) match {
          case Some((name, layout, _)) =>
            val vals = HprofParser.decodeInstance(ev.fields, idSz, layout)
            val fields = layout.zip(vals).map { case (f, v) =>
              if (f.typeTag == BasicType.Object) f"${f.name}=0x${v.asInstanceOf[Long]}%x"
              else s"${f.name}=$v"
            }.mkString(", ")
            f"$name@0x${ev.objId}%x {$fields}"
          case None => f"(unresolved)@0x${ev.objId}%x"
        })
        override def onClassDump(cd: ClassDumpInfo): Unit = buf += (classInfo.get(cd.classObjId) match {
          case Some((name, _, statics)) =>
            val sf = statics.map { case (n, t, pv, rid) =>
              if (t == BasicType.Object) f"static $n=0x$rid%x" else s"static $n=$pv"
            }.mkString(", ")
            f"class $name@0x${cd.classObjId}%x {$sf}"
          case None => f"class (unresolved)@0x${cd.classObjId}%x"
        })
        override def onObjArray(ev: ObjArrayEv): Unit = {
          val els = ev.elements.take(8).map(e => f"0x$e%x").mkString(", ")
          val more = if (ev.elements.size > 8) ", ..." else ""
          val elemName = classInfo.get(ev.arrayClassObjId)
            .map(c => HeapIndex.normalizeArrayName(c._1).stripSuffix("[]"))
            .getOrElse("(unresolved)")
          buf += f"$elemName[${ev.elements.size}]@0x${ev.objId}%x [$els$more]"
        }
        override def onPrimArray(ev: PrimArrayEv): Unit = {
          val vals: Seq[Any] = ev.elemType match {
            case BasicType.Boolean => ev.booleans
            case BasicType.Byte => ev.bytes
            case BasicType.Char => ev.chars
            case BasicType.Short => ev.shorts
            case BasicType.Int => ev.ints
            case BasicType.Long => ev.longs
            case BasicType.Float => ev.floats
            case _ => ev.doubles
          }
          val preview = vals.take(8).mkString(", ")
          val more = if (vals.size > 8) ", ..." else ""
          buf += f"${BasicType.javaName(ev.elemType)}[${vals.size}]@0x${ev.objId}%x [$preview$more]"
        }
      }
    }.take(limit).toSeq
  }

  // -- A11: full parquet export ---------------------------------------
  /** Write every table under outDir, one directory per table —
    * the Spark-native equivalent of `dump-objects-to-parquet`
    * (16-way chunking falls out of partition count instead of a
    * writer-thread pool).
    *
    * `resolveRefs = true` is the reference's DEFAULT (non-robo) mode:
    * every reference field in a per-class table is materialized as
    * STRUCT{id,type} by joining the object index — one shuffle join
    * per ref column. Default stays robo (bare longs + `_object_index`):
    * at 100 TB the lazy-join view costs the join only for the columns
    * a query actually touches.
    */
  def writeParquet(outDir: String, resolveRefs: Boolean = false): Unit = {
    def w(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name")

    if (!resolveRefs) {
      // The five driver-derived metadata tables are KB-sized: their
      // wall-clock is five job-launch + commit round-trips, not data
      // (~1 s of the ~3.5 s bench-dump export when sequential).
      // Submit them from worker threads so their latency hides behind
      // the heap-scanning job — concurrent job submission is the
      // supported Spark pattern for independent outputs.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val metadataWrites = Future.sequence(Seq(
        Future(w(classHierarchy, "_class_hierarchy")),
        Future(w(fieldsTable, "_fields")),
        Future(w(stackFrames, "_stack_frames")),
        Future(w(stackTraces, "_stack_traces")),
        Future(w(staticFields, "_static_fields"))))
      // ONE pass-2 job writes everything else: the system tables
      // multiplexed from the segment scan itself, the per-class
      // tables from the clustered shuffle fed by the same scan.
      // If the scan throws, the background metadata writes must still
      // be drained before surfacing the failure — otherwise they keep
      // running into outDir after the caller has already seen the
      // export fail (orphaned jobs, partially-populated directory).
      try {
        writeRoboTablesSinglePass(outDir)
        Await.result(metadataWrites, Duration.Inf)
      } catch {
        case scanFailure: Throwable =>
          // Await.ready (not result) so a metadata failure can't mask
          // the scan's own exception; interrupt/timeout here is
          // impossible with Duration.Inf outside of JVM shutdown.
          try Await.ready(metadataWrites, Duration.Inf)
          catch { case _: InterruptedException => Thread.currentThread().interrupt() }
          throw scanFailure
      }
    } else {
      // driver-side tables come from the pass-1 index: no heap re-scan
      w(classHierarchy, "_class_hierarchy")
      w(fieldsTable, "_fields")
      w(stackFrames, "_stack_frames")
      w(stackTraces, "_stack_traces")
      // resolved mode (the reference's non-robo default) keeps the
      // DataFrame writes: it re-reads _object_index for the ref
      // struct joins, so the tables must exist as plans anyway
      w(objectIndex, "_object_index")
      w(objectArrays, "_object_arrays")
      w(gcRoots, "_gc_roots")
      // resolved mode adds a ref_type column to static fields
      // (reference build_static_fields_batch: "" for primitives,
      // "null" for null refs, type name otherwise)
      val oi = objectIndex.select(col("obj_id").as("__ref"), col("type_name"))
      val sfOut = staticFields.join(oi, col("ref_id") === col("__ref"), "left")
        .withColumn("ref_type",
          when(col("field_type") =!= "object", "")
            .when(col("ref_id") === 0, "null")
            .otherwise(coalesce(col("type_name"), lit("(unresolved)"))))
        .drop("__ref", "type_name")
      w(sfOut, "_static_fields")
      val prim = primitiveArraysAll.persist()
      try {
        primCols.foreach { case (tag, _) =>
          w(primitiveArrays(tag, prim), s"_primitive_arrays_${BasicType.javaName(tag)}")
        }
      } finally prim.unpersist()
      writeClassTablesResolved(outDir)
    }
  }

  /** Robo-mode pass 2 as ONE job over ONE parse: each segment task
    * writes its slice of the system tables directly (SystemTableWriter
    * side files, deterministic names — retry-safe) while streaming
    * instance events into the (class, salt) exchange that feeds the
    * clustered per-class writers. Total dump reads: pass-1 metadata +
    * this — the same two-pass budget as the reference's rayon
    * pipeline, where the previous layout re-parsed the full dump once
    * per system-table family (~5× read amplification at 100 TB).
    */
  private[heap] def writeRoboTablesSinglePass(outDir: String): Unit = {
    HeapIO.withFs(outDir) { (fs, p) =>
      SystemTableWriter.tableNames.foreach { t =>
        val tp = new Path(p, t)
        if (fs.exists(tp)) fs.delete(tp, true)
      }
    }
    val names = bcClassNames
    val idSz = idSize
    val p = path
    val od = outDir
    val evRdd: RDD[InstanceEv] = spark.sparkContext
      .parallelize(segPtrs, parallelism(segPtrs.size))
      .mapPartitionsWithIndex { (pid, it) =>
        val out = mutable.ArrayBuffer.empty[InstanceEv]
        val writers = new SystemTableWriter(od, pid, names.value)
        try {
          HeapIO.withFs(p) { (fs, hp) =>
            val in = fs.open(hp)
            try it.foreach { r =>
              require(r.bodyLength <= Int.MaxValue,
                s"record body ${r.bodyLength} exceeds 2 GiB buffer limit (tag ${r.tag})")
              val buf = new Array[Byte](r.bodyLength.toInt)
              in.readFully(r.bodyOffset, buf)
              HprofParser.scanSegment(buf, idSz, new SubVisitor {
                override def onInstance(ev: InstanceEv): Unit = { writers.onInstance(ev); out += ev }
                override def onPrimArray(ev: PrimArrayEv): Unit = writers.onPrimArray(ev)
                override def onObjArray(ev: ObjArrayEv): Unit = writers.onObjArray(ev)
                override def onGcRoot(ev: GcRootEv): Unit = writers.onGcRoot(ev)
                override def onClassDump(cd: ClassDumpInfo): Unit = writers.onClassDump(cd)
              })
            } finally in.close()
          }
          writers.close()
        } catch {
          case e: Throwable => writers.abort(); throw e
        }
        out.iterator
      }
    writeClassTablesSinglePass(outDir, evRdd)
  }

  /** Robo-mode per-class tables in ONE job: segment parse →
    * hash-cluster by (class, salt) → class-sorted partitions →
    * executor-side parquet writers (ClassTableWriter). Read volume is
    * O(heap) regardless of class count — the former job-per-class
    * loop rescanned the instance set once per class.
    *
    * The salt is SIZE-ADAPTIVE, assigned map-side from a per-task
    * running count: a class contributes one salt bucket per
    * `rowsPerBucket` rows it has IN THAT TASK (capped at
    * `saltBuckets`). Small classes — the overwhelming majority of a
    * real dump's ~10k classes — land in a single bucket and produce
    * one file; only classes that are actually big (java.lang.String)
    * spread across up to `saltBuckets` writer tasks. A uniform salt
    * costs classes × salt parquet footers (measured 6× slower on the
    * 200-class bench dump); per-class pre-counts would cost an extra
    * full parse. Zero extra passes, adaptive, deterministic table
    * CONTENT (file boundaries vary with partitioning, row data does
    * not).
    */
  private[heap] def writeClassTablesSinglePass(outDir: String,
      src: RDD[InstanceEv] = null): Unit = {
    dropExistingClassTables(outDir)
    val tables: Map[Long, (String, Seq[LayoutField])] =
      index.classes.map { case (cid, ci) => cid -> (s"${ci.name}_$cid", ci.layout) }
    val bcTables = spark.sparkContext.broadcast(tables)
    val idSz = idSize
    val saltBuckets = spark.conf.getOption("spark.graft.heap.saltBuckets")
      .map(_.toInt).getOrElse(16)
    val rowsPerBucket = spark.conf.getOption("spark.graft.heap.rowsPerBucket")
      .map(_.toInt).getOrElse(1 << 16)
    val numParts = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32))
    val salted = (if (src == null) instancesEvents else src).mapPartitions { it =>
      val seen = mutable.HashMap.empty[Long, Long]
      it.map { ev =>
        val c = seen.getOrElse(ev.classObjId, 0L)
        seen(ev.classObjId) = c + 1
        (ev.classObjId, ((c / rowsPerBucket) % saltBuckets).toInt, ev.objId, ev.fields)
      }
    }
    spark.createDataFrame(salted)
      .toDF("classObjId", "salt", "objId", "fields")
      .repartition(numParts, col("classObjId"), col("salt"))
      .sortWithinPartitions("classObjId")
      .select("classObjId", "objId", "fields")
      .foreachPartition { (rows: Iterator[Row]) =>
        ClassTableWriter.writePartition(rows,
          org.apache.spark.TaskContext.getPartitionId(), outDir, bcTables.value, idSz)
      }
  }

  /** Resolved-mode (the reference's non-robo default): every ref field
    * becomes STRUCT{id,type} via joins against the object index, which
    * forces per-class DataFrame plans. Scale shape: the raw instances
    * are staged ONCE as class-partitioned parquet, so each class job
    * reads only its own partition directory (pruned scan, not a full
    * rescan), the index side comes from the already-written
    * `_object_index` parquet, and class jobs run concurrently.
    */
  private def writeClassTablesResolved(outDir: String): Unit = {
    dropExistingClassTables(outDir)
    val stage = s"$outDir/.instances_staged"
    instancesRaw.write.mode("overwrite").partitionBy("classObjId").parquet(stage)
    val staged = spark.read.parquet(stage)
    val oi = spark.read.parquet(s"$outDir/_object_index")
    val classIds = HeapIO.withFs(stage) { (fs, p) =>
      fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("classObjId=")).map(_.stripPrefix("classObjId=").toLong)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(8, classIds.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val jobs = classIds.sorted.filter(index.classes.contains).map { cid =>
        scala.concurrent.Future {
          val base = instances(cid, staged)
          val df = index.classes(cid).layout.filter(_.typeTag == BasicType.Object)
            .foldLeft(base)((d, f) => HeapTables.resolveRef(d, f.name, oi))
          df.write.mode("overwrite").parquet(s"$outDir/${index.className(cid)}_$cid")
        }
      }
      import scala.concurrent.duration.Duration
      jobs.foreach(scala.concurrent.Await.result(_, Duration.Inf))
    } finally {
      pool.shutdown()
      HeapIO.withFs(stage)((fs, p) => fs.delete(p, true))
    }
  }

  /** Metadata-only cleanup so a re-export to the same directory can't
    * leave stale part files from a previous layout behind.
    */
  private def dropExistingClassTables(outDir: String): Unit =
    HeapIO.withFs(outDir) { (fs, p) =>
      if (fs.exists(p)) {
        val classDirs = index.classes.map { case (cid, ci) => s"${ci.name}_$cid" }.toSet
        fs.listStatus(p).foreach { st =>
          if (st.isDirectory && classDirs.contains(st.getPath.getName))
            fs.delete(st.getPath, true)
        }
      }
    }
}

object HeapDump {
  /** Re-lay an export as FLAT chunked files — the reference robo-mode
    * naming convention (`<table>_chunk<N>.parquet`,
    * dump_to_parquet.rs chunked per-class files) — so glob-based
    * readers (`read_parquet('java.lang.String_*_chunk*.parquet')`,
    * `spark.read.parquet(".../_object_index_chunk*.parquet")`) port
    * verbatim. Caveat: Spark itself treats `_`-prefixed basenames as
    * hidden, so the renamed SYSTEM tables (`_object_index_chunk*`) are
    * for external glob readers; Spark callers should query before
    * flattening (or use the directory layout). Class tables glob fine
    * from Spark. Pure same-filesystem renames of the Spark part-files:
    * metadata ops only, no data movement, so it stays O(files) at any
    * heap size. The directory layout is consumed; call it only when a
    * downstream consumer wants the reference's file contract.
    */
  def flattenExport(outDir: String): Unit = {
    val root = new java.io.File(outDir)
    require(root.isDirectory, s"not an export directory: $outDir")
    for (tableDir <- root.listFiles().filter(_.isDirectory)) {
      val parts = tableDir.listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        val dest = new java.io.File(root, s"${tableDir.getName}_chunk$i.parquet")
        require(f.renameTo(dest), s"rename failed: $f -> $dest")
      }
      // drop the emptied directory and its _SUCCESS/. markers
      tableDir.listFiles().foreach(_.delete())
      if (!tableDir.delete())
        throw new java.io.IOException(s"could not remove $tableDir")
    }
  }
}
