package graft.heap

import graft.SparkTestSession
import HprofModel._
import org.scalatest.funsuite.AnyFunSuite

/** Parser → tables pipeline against a synthetic heap with known
  * answers (SURVEY.md §2.A). The heap is written with the test-scope
  * HprofWriter, read back through the full distributed path.
  */
class HeapDumpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // -- build a small known heap ---------------------------------------
  private lazy val fixture: (HeapDump, Fixture) = {
    val w = new HprofWriter()
    val f = new Fixture(w)
    val path = java.nio.file.Files.createTempDirectory("heap").resolve("test.hprof").toString
    w.writeTo(path, segments = 3)
    (new HeapDump(spark, path), f)
  }

  final class Fixture(w: HprofWriter) {
    val objectCls = w.defineClass("java.lang.Object")
    val stringCls = w.defineClass("java.lang.String", objectCls,
      instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
    val integerCls = w.defineClass("java.lang.Integer", objectCls,
      instanceFields = Seq("value" -> BasicType.Int))
    val personCls = w.defineClass("com.acme.Person", objectCls,
      instanceFields = Seq("name" -> BasicType.Object, "age" -> BasicType.Int))
    val employeeCls = w.defineClass("com.acme.Employee", personCls,
      instanceFields = Seq("name" -> BasicType.Object, "salary" -> BasicType.Double),
      staticFields = Seq(("COMPANY", BasicType.Object, 0x9999L), ("HEADCOUNT", BasicType.Int, 42)))
    val objArrayCls = w.defineClass("[Ljava.lang.Object;", objectCls)
    // B26: the same name under two distinct loaders (ids are arbitrary
    // object ids here — the parser must carry them through verbatim)
    val pluginClsA = w.defineClass("com.acme.Plugin", objectCls,
      instanceFields = Seq("gen" -> BasicType.Int), loaderId = 0x7001L)
    val pluginClsB = w.defineClass("com.acme.Plugin", objectCls,
      instanceFields = Seq("gen" -> BasicType.Int), loaderId = 0x7002L)

    val helloBytes1 = w.byteArray("hello")
    val helloBytes2 = w.byteArray("hello")
    val worldBytes = w.byteArray("world")
    val zeroInts = w.primArray(BasicType.Int, Seq(0, 0, 0, 0))
    val emptyLongs = w.primArray(BasicType.Long, Seq.empty)
    val singleFloat = w.primArray(BasicType.Float, Seq(1.5f))
    val someChars = w.primArray(BasicType.Char, Seq('h'.toInt, 'i'.toInt))

    val str1 = w.instance(stringCls, Seq(BasicType.Object -> helloBytes1, BasicType.Int -> 99))
    val str2 = w.instance(stringCls, Seq(BasicType.Object -> helloBytes2, BasicType.Int -> 99))
    val str3 = w.instance(stringCls, Seq(BasicType.Object -> worldBytes, BasicType.Int -> 7))
    val boxed1 = w.instance(integerCls, Seq(BasicType.Int -> 5))
    val emp = w.instance(employeeCls, Seq(
      BasicType.Object -> str1,   // Employee.name
      BasicType.Double -> 1234.5, // Employee.salary
      BasicType.Object -> str3,   // Person.name (shadowed)
      BasicType.Int -> 31))       // Person.age

    val emptyArr = w.objArray(objArrayCls, Seq.empty)
    val allNullArr = w.objArray(objArrayCls, Seq(0L, 0L, 0L))
    val normalArr = w.objArray(objArrayCls, Seq(str1, str2, 0L))

    w.gcRoot(Sub.RootThreadObject, emp, threadSerial = 1)
    w.gcRoot(Sub.RootStickyClass, stringCls)
    w.gcRoot(Sub.RootJniGlobal, str3)
    w.gcRoot(Sub.RootJavaFrame, boxed1, threadSerial = 1, frameIdx = 0)

    val frame1 = w.stackFrame("main", "([Ljava/lang/String;)V", "Main.java", "com.acme.Person", 10)
    val frame2 = w.stackFrame("run", "()V", "Worker.java", "com.acme.Employee", 20)
    w.stackTrace(serial = 1, threadSerial = 1, Seq(frame1, frame2))
  }

  test("header and record index parse") {
    val (hd, _) = fixture
    assert(hd.idSize === 8)
    assert(hd.header.formatName === "JAVA PROFILE 1.0.2")
    val byTag = hd.records.groupBy(_.tag)
    assert(byTag(Tag.HeapDumpSegment).size === 3)
    assert(byTag(Tag.HeapDumpEnd).size === 1)
    assert(byTag(Tag.StackFrame).size === 2)
    assert(byTag(Tag.StackTrace).size === 1)
  }

  test("countRecords tallies record types") {
    val (hd, _) = fixture
    val counts = hd.countRecords.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("HeapDumpSegment") === 3L)
    assert(counts("LoadClass") === 8L)
  }

  test("index resolves classes, layouts and shadowed field names") {
    val (hd, f) = fixture
    val emp = hd.index.classes(f.employeeCls)
    assert(emp.name === "com.acme.Employee")
    assert(emp.layout.map(_.name) === Seq("name", "salary", "Person@name", "age"))
    assert(hd.index.classes(f.stringCls).layout.map(_.name) === Seq("value", "hash"))
  }

  test("fieldsTable records full layouts with exact slot order and types") {
    val (hd, f) = fixture
    val rows = hd.fieldsTable.collect()
      .map(r => (r.getString(1), r.getInt(2), r.getString(3), r.getString(4)))
    // Employee layout: own (name: object, salary) then super Person's
    // shadowed name (object) and age — slot order IS decode order
    val emp = rows.filter(_._1 == "com.acme.Employee").sortBy(_._2)
    assert(emp.map(t => (t._2, t._3, t._4)).toSeq === Seq(
      (0, "name", "object"), (1, "salary", "double"),
      (2, "Person@name", "object"), (3, "age", "int")))
    val str = rows.filter(_._1 == "java.lang.String").sortBy(_._2)
    assert(str.map(t => (t._3, t._4)).toSeq === Seq(("value", "object"), ("hash", "int")))
  }

  test("objectIndex covers instances, arrays and classes") {
    val (hd, f) = fixture
    val idx = hd.objectIndex.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(idx(f.str1) === "java.lang.String")
    assert(idx(f.boxed1) === "java.lang.Integer")
    assert(idx(f.helloBytes1) === "byte[]")
    assert(idx(f.zeroInts) === "int[]")
    assert(idx(f.normalArr) === "java.lang.Object[]")
    assert(idx(f.stringCls) === "class java.lang.String")
    // every emitted object is indexed: 7 prim arrays, 3 obj arrays,
    // 5 instances, 8 classes (Plugin defined twice)
    assert(idx.size === 7 + 3 + 5 + 8)
  }

  test("typed instance tables decode fields") {
    val (hd, f) = fixture
    val strings = hd.instances(f.stringCls).collect()
      .map(r => r.getAs[Long]("obj_id") -> (r.getAs[Long]("value"), r.getAs[Int]("hash"))).toMap
    assert(strings(f.str1) === (f.helloBytes1, 99))
    assert(strings(f.str3) === (f.worldBytes, 7))

    val emp = hd.instances(f.employeeCls).collect()
    assert(emp.length === 1)
    val r = emp.head
    assert(r.getAs[Long]("name") === f.str1)
    assert(r.getAs[Double]("salary") === 1234.5)
    assert(r.getAs[Long]("Person@name") === f.str3)
    assert(r.getAs[Int]("age") === 31)
  }

  test("instancesByName unions loaders") {
    val (hd, f) = fixture
    val df = hd.instancesByName("java.lang.String")
    assert(df.isDefined)
    assert(df.get.count() === 3)
  }

  test("primitive arrays round-trip per type") {
    val (hd, f) = fixture
    val bytes = hd.primitiveArrays(BasicType.Byte).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    assert(new String(bytes(f.helloBytes1), "UTF-8") === "hello")
    assert(new String(bytes(f.worldBytes), "UTF-8") === "world")
    val ints = hd.primitiveArrays(BasicType.Int).collect()
    assert(ints.length === 1 && ints.head.getSeq[Int](1) === Seq(0, 0, 0, 0))
    val longs = hd.primitiveArrays(BasicType.Long).collect()
    assert(longs.length === 1 && longs.head.getSeq[Long](1).isEmpty)
    val floats = hd.primitiveArrays(BasicType.Float).collect()
    assert(floats.head.getSeq[Float](1) === Seq(1.5f))
    val chars = hd.primitiveArrays(BasicType.Char).collect()
    assert(chars.head.getSeq[Int](1) === Seq('h'.toInt, 'i'.toInt))
  }

  test("object arrays with class names and null elements") {
    val (hd, f) = fixture
    val arrs = hd.objectArrays.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    assert(arrs(f.emptyArr).isEmpty)
    assert(arrs(f.allNullArr) === Seq(0L, 0L, 0L))
    assert(arrs(f.normalArr) === Seq(f.str1, f.str2, 0L))
  }

  test("gc roots typed and attributed") {
    val (hd, f) = fixture
    val roots = hd.gcRoots.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(roots === Set(
      ("ThreadObj", f.emp), ("SystemClass", f.stringCls),
      ("JniGlobal", f.str3), ("JavaStackFrame", f.boxed1)))
  }

  test("static fields table") {
    val (hd, f) = fixture
    val rows = hd.staticFields.collect().map(r =>
      (r.getString(1), r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
    assert(rows.contains(("com.acme.Employee", "COMPANY", "object", "", 0x9999L)))
    assert(rows.contains(("com.acme.Employee", "HEADCOUNT", "int", "42", 0L)))
  }

  test("stack frames and traces resolve") {
    val (hd, f) = fixture
    val frames = hd.stackFrames.collect()
      .map(r => r.getString(2) -> (r.getString(1), r.getInt(5))).toMap
    assert(frames("main") === ("com.acme.Person", 10))
    assert(frames("run") === ("com.acme.Employee", 20))
    val traces = hd.stackTraces.collect()
    assert(traces.length === 1)
    assert(traces.head.getSeq[Long](2) === Seq(f.frame1, f.frame2))
  }

  test("class hierarchy") {
    val (hd, f) = fixture
    val hier = hd.classHierarchy.collect()
      .map(r => r.getString(1) -> Option(r.get(3)).map(_.toString)).toMap
    assert(hier("com.acme.Employee") === Some("com.acme.Person"))
    assert(hier("java.lang.Object") === None)
  }

  test("B26: loader ids survive the parse and the census finds the duplicate name") {
    val (hd, f) = fixture
    val loaders = hd.classHierarchy.collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getLong(4)).toMap
    assert(loaders((("com.acme.Plugin"), f.pluginClsA)) === 0x7001L)
    assert(loaders((("com.acme.Plugin"), f.pluginClsB)) === 0x7002L)
    assert(loaders((("java.lang.Object"), f.objectCls)) === 0L, "default = bootstrap")
    val out = java.nio.file.Files.createTempDirectory("heap_b26").toString
    hd.writeParquet(out)
    val census = new HeapAnalysis(new HeapTables(spark, out)).classloaderCensus.get
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
    assert(census.toSeq === Seq("com.acme.Plugin" ->
      ((2L, 2L, s"${0x7001L},${0x7002L}"))), "only the duplicated name surfaces")
  }

  test("renderObjects covers instances, classes and arrays") {
    val (hd, _) = fixture
    val lines = hd.renderObjects(100)
    assert(lines.exists(l => l.startsWith("java.lang.String@") && l.contains("hash=99")))
    assert(lines.exists(l => l.startsWith("class com.acme.Employee@") && l.contains("static HEADCOUNT=42")))
    assert(lines.exists(_.startsWith("byte[5]@")))
    assert(lines.exists(_.startsWith("java.lang.Object[3]@")))
  }

  test("writeParquet resolveRefs materializes STRUCT{id,type} refs (non-robo mode)") {
    val (hd, f) = fixture
    val out = java.nio.file.Files.createTempDirectory("heap_pq_res").toString
    hd.writeParquet(out, resolveRefs = true)
    val strs = spark.read.parquet(s"$out/java.lang.String_${f.stringCls}")
    val row = strs.filter(org.apache.spark.sql.functions.col("obj_id") === f.str1)
      .selectExpr("value.id", "value.type").collect().head
    assert(row.getLong(0) === f.helloBytes1)
    assert(row.getString(1) === "byte[]")
    // Employee has two ref fields incl. the shadowed one
    val emp = spark.read.parquet(s"$out/com.acme.Employee_${f.employeeCls}")
    val er = emp.selectExpr("name.type", "`Person@name`.type").collect().head
    assert(er.getString(0) === "java.lang.String")
    assert(er.getString(1) === "java.lang.String")

    // static fields gain a resolved ref_type column in this mode
    val sf = spark.read.parquet(s"$out/_static_fields")
      .collect().map(r => r.getAs[String]("field_name") -> r.getAs[String]("ref_type")).toMap
    assert(sf("HEADCOUNT") === "")
    assert(sf("COMPANY") === "(unresolved)") // 0x9999 points nowhere in the fixture
  }

  test("writeParquet exports all tables") {
    val (hd, _) = fixture
    val out = java.nio.file.Files.createTempDirectory("heap_pq").toString
    hd.writeParquet(out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(dirs.contains("_object_index"))
    assert(dirs.contains("_primitive_arrays_byte"))
    assert(dirs.exists(_.startsWith("java.lang.String_")))
    val idx = spark.read.parquet(s"$out/_object_index")
    assert(idx.count() === 23)
  }
}
