package graft.heap

import graft.SparkTestSession
import HprofModel.BasicType
import org.scalatest.funsuite.AnyFunSuite

/** Bare-name temp views are a shared catalog resource; concurrent
  * queries against DIFFERENT sessions must each resolve their own
  * dump's tables (registration + analysis are atomic under the
  * catalog lock).
  */
class HeapSessionsConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def export(n: Int): String = {
    val w = new HprofWriter()
    val obj = w.defineClass("java.lang.Object")
    val box = w.defineClass("java.lang.Integer", obj,
      instanceFields = Seq("value" -> BasicType.Int))
    (1 to n).foreach(i => w.instance(box, Seq(BasicType.Int -> i)))
    val dir = java.nio.file.Files.createTempDirectory(s"conc_$n")
    val hp = dir.resolve("t.hprof").toString
    w.writeTo(hp)
    val out = dir.resolve("pq").toString
    new HeapDump(spark, hp).writeParquet(out)
    out
  }

  test("interleaved bare-name queries on two sessions stay isolated") {
    val hs = new HeapSessions(spark)
    hs.open(export(3), "ca")   // sum 1..3 = 6
    hs.open(export(5), "cb")   // sum 1..5 = 15
    val expected = Map("ca" -> 6L, "cb" -> 15L)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val futures = (1 to 24).map { i =>
      val id = if (i % 2 == 0) "ca" else "cb"
      Future {
        val got = hs.query(id, "SELECT SUM(value) FROM java_lang_Integer")
          .collect()(0).getLong(0)
        id -> got
      }
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.foreach { case (id, got) =>
      assert(got === expected(id), s"session $id resolved the wrong dump")
    }
  }
}
