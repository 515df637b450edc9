package graft.heap

/** Data model for the public HPROF 1.0.2 binary format (the format
  * HotSpot writes for `jmap -dump` / OOM heap dumps; spec ships with
  * the JDK as `hprof_b_spec.html`). Mirrors the behavior of the
  * reference ETL (`/root/reference/src/commands/dump_to_parquet.rs`,
  * `/root/reference/src/hprof_index.rs`) without porting it: this is
  * the input side of a Spark-native ingestion pipeline.
  */
object HprofModel {

  /** Top-level record tags. */
  object Tag {
    val Utf8 = 0x01
    val LoadClass = 0x02
    val UnloadClass = 0x03
    val StackFrame = 0x04
    val StackTrace = 0x05
    val AllocSites = 0x06
    val HeapSummary = 0x07
    val StartThread = 0x0a
    val EndThread = 0x0b
    val HeapDump = 0x0c
    val CpuSamples = 0x0d
    val ControlSettings = 0x0e
    val HeapDumpSegment = 0x1c
    val HeapDumpEnd = 0x2c

    def name(tag: Int): String = tag match {
      case Utf8 => "Utf8"
      case LoadClass => "LoadClass"
      case UnloadClass => "UnloadClass"
      case StackFrame => "StackFrame"
      case StackTrace => "StackTrace"
      case AllocSites => "AllocSites"
      case HeapSummary => "HeapSummary"
      case StartThread => "StartThread"
      case EndThread => "EndThread"
      case HeapDump => "HeapDump"
      case CpuSamples => "CpuSamples"
      case ControlSettings => "ControlSettings"
      case HeapDumpSegment => "HeapDumpSegment"
      case HeapDumpEnd => "HeapDumpEnd"
      case t => f"Unknown(0x$t%02x)"
    }

    def isHeapSegment(tag: Int): Boolean = tag == HeapDump || tag == HeapDumpSegment
  }

  /** Heap sub-record tags. */
  object Sub {
    val RootUnknown = 0xff
    val RootJniGlobal = 0x01
    val RootJniLocal = 0x02
    val RootJavaFrame = 0x03
    val RootNativeStack = 0x04
    val RootStickyClass = 0x05
    val RootThreadBlock = 0x06
    val RootMonitorUsed = 0x07
    val RootThreadObject = 0x08
    val ClassDump = 0x20
    val InstanceDump = 0x21
    val ObjectArrayDump = 0x22
    val PrimitiveArrayDump = 0x23
  }

  /** HPROF basic-type tags (shared by fields and primitive arrays). */
  object BasicType {
    val Object = 2
    val Boolean = 4
    val Char = 5
    val Float = 6
    val Double = 7
    val Byte = 8
    val Short = 9
    val Int = 10
    val Long = 11

    def size(tag: Int, idSize: Int): Int = tag match {
      case Object => idSize
      case Boolean | Byte => 1
      case Char | Short => 2
      case Float | Int => 4
      case Double | Long => 8
      case t => throw new IllegalArgumentException(s"unknown basic type $t")
    }

    def javaName(tag: Int): String = tag match {
      case Object => "object"
      case Boolean => "boolean"
      case Char => "char"
      case Float => "float"
      case Double => "double"
      case Byte => "byte"
      case Short => "short"
      case Int => "int"
      case Long => "long"
    }
  }

  /** Pointer to one top-level record's body within the dump file. */
  final case class RecordPtr(tag: Int, bodyOffset: Long, bodyLength: Long)

  final case class FieldDesc(nameId: Long, typeTag: Int)

  final case class StaticField(nameId: Long, typeTag: Int, primitive: String, refId: Long)

  final case class ClassDumpInfo(
      classObjId: Long,
      superClassObjId: Long, // 0 = none
      instanceSize: Int,
      staticFields: Seq[StaticField],
      instanceFields: Seq[FieldDesc],
      loaderObjId: Long = 0L) // 0 = bootstrap loader

  final case class LoadClassInfo(serial: Int, classObjId: Long, nameId: Long)

  final case class StackFrameRec(
      frameId: Long, methodNameId: Long, methodSigId: Long,
      sourceFileId: Long, classSerial: Int, lineNum: Int)

  final case class StackTraceRec(serial: Int, threadSerial: Int, frameIds: Seq[Long])

  // -- Parsed heap sub-record events (pass-2 emissions) ----------------

  final case class InstanceEv(objId: Long, classObjId: Long, fields: Array[Byte])

  final case class ObjArrayEv(objId: Long, arrayClassObjId: Long, elements: Seq[Long])

  /** One primitive array; exactly one of the value seqs is non-null.
    * Chars widen to Int (no unsigned 16-bit type in Spark).
    */
  final case class PrimArrayEv(
      objId: Long, elemType: Int,
      booleans: Seq[Boolean], bytes: Seq[Byte], chars: Seq[Int],
      shorts: Seq[Short], ints: Seq[Int], longs: Seq[Long],
      floats: Seq[Float], doubles: Seq[Double])

  final case class GcRootEv(
      rootType: String, objId: Long,
      threadSerial: Option[Int], frameIndex: Option[Int])

  /** A field in a class's full-hierarchy instance layout: declared
    * name disambiguated with `Declaring@name` when shadowed
    * (reference: util.rs:64-86).
    */
  final case class LayoutField(name: String, typeTag: Int)
}
