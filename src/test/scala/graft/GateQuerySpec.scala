package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()
}

/** Registry-level contract: unique names, oracle keys subset, every
  * query runs non-empty at sf0.001. Value-level parity vs DuckDB is
  * checked by tools/check.py (mirrors the driver's t2 gate).
  */
class GateQuerySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("query names are unique") {
    val names = SparkEntry.gateQueries.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.gateQueries) {
    test(s"${q.name} runs and returns rows at sf0.001") {
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
