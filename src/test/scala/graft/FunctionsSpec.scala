package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst expressions: codegen and interpreted paths agree,
  * SQL registration works, SimHash64 has the locality property that
  * makes it a near-dup fingerprint.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def simhash64(c: org.apache.spark.sql.Column) =
    GraftColumnBridge.column(graft.functions.SimHash64(GraftColumnBridge.expression(c)))

  test("dot_product matches HOF fold exactly") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(0.5, -1.0, 2.0))).toDF("a", "b")
    val viaExpr = df.select(graft.functions.VectorFunctions.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    val viaHof = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)).collect()(0).getDouble(0)
    assert(viaExpr === viaHof)
    assert(viaExpr === 1.0 * 0.5 - 2.0 + 6.0)
  }

  test("dot_product codegen and interpreted agree on testdata") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val expr = graft.functions.VectorFunctions.dot(col("v"), col("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val diff = emb.select(abs(expr - hof).as("d")).agg(max("d")).collect()(0).getDouble(0)
    assert(diff === 0.0)
  }

  test("simhash64: deterministic, locality-sensitive") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely unrelated content about heap dumps and parquet columns"
    val df = Seq(("base", base), ("near", near), ("far", far)).toDF("k", "text")
      .select(col("k"), TextFunctions.tokens(col("text")).as("ws"))
      .select(col("k"), simhash64(col("ws")).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(m("base"), m("near")) < hamming(m("base"), m("far")))
    assert(hamming(m("base"), m("near")) <= 16)
    // deterministic across partitionings
    val again = Seq(("base", base)).toDF("k", "text")
      .repartition(3)
      .select(simhash64(TextFunctions.tokens(col("text")))).collect()(0).getLong(0)
    assert(again === m("base"))
  }

  test("SQL registration: dot_product and simhash64 callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "simhash64(array('a','b','c')) AS s").collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) !== 0L)
  }

  test("heap SQL surface: ad-hoc queries over registered views") {
    import graft.heap._
    import graft.heap.HprofModel.BasicType
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val str = w.defineClass("java.lang.String", obj,
      instanceFields = Seq("value" -> BasicType.Object, "hash" -> BasicType.Int))
    val b = w.byteArray("x")
    (1 to 4).foreach(i => w.instance(str, Seq(BasicType.Object -> b, BasicType.Int -> i)))
    val dir = java.nio.file.Files.createTempDirectory("heapsql")
    val hp = dir.resolve("h.hprof").toString
    w.writeTo(hp)
    val out = dir.resolve("pq").toString
    new HeapDump(spark, hp).writeParquet(out)

    val views = HeapSql.register(spark, out)
    assert(views.contains("_object_index"))
    assert(views.contains("java_lang_String"))
    val n = spark.sql(
      """SELECT COUNT(*) FROM java_lang_String s
        |JOIN _primitive_arrays_byte b ON s.value = b.obj_id""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === 4L)

    val tables = new graft.heap.HeapTables(spark, out)
    val listed = tables.list.collect().map(_.getString(0))
    assert(listed.contains("_object_index"))
    assert(listed.exists(_.startsWith("java.lang.String_")))

    // non-robo STRUCT{id,type} view via lazy join
    val resolved = tables.withResolvedRef(tables.byClass("java.lang.String").get, "value")
    val row = resolved.selectExpr("value.id", "value.type").collect().head
    assert(row.getString(1) === "byte[]")
  }
}
