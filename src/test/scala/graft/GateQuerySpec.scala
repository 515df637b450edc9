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

  // --- SURVEY §6 dtype-portability regression guard -------------------
  // The driver's value hash is dtype-sensitive to DuckDB's HUGEINT
  // widening (int32-vs-int64 differences hash fine — 37 green gates
  // prove it — but HUGEINT does not), and two rounds in a row the
  // NEWEST gates red-lit on it (r4 q_pack_bins/q_curate_full). HUGEINT
  // reaches an oracle's output through integer division `//` over a
  // windowed SUM(BIGINT); the statically checkable convention is that
  // every `//` carries a CAST on the same line. The dynamic half of
  // the guard is tools/check.py, which now fails any oracle result
  // column whose DuckDB type is HUGEINT/DECIMAL against a non-decimal
  // Spark column.
  // Known-safe `//` uses: a plain-integer division whose result is only
  // a bounded intermediate (group key over generate_series ints), never
  // an output column — `//` over un-widened BIGINT stays BIGINT.
  // q_lsh_calibration shares q_dedup_minhash's bands CTE verbatim
  // (i // 3 as a bounded group key); its output columns are all CAST
  private val uncastDivExempt = Set("q_dedup_minhash", "q_lsh_calibration")

  for (q <- SparkEntry.gateQueries; sql <- q.oracle; if !uncastDivExempt(q.name)) {
    test(s"${q.name} oracle: every // line is CAST-wrapped") {
      val bad = sql.linesIterator.filter(l => l.contains("//") && !l.contains("CAST("))
      assert(bad.isEmpty,
        s"${q.name}: DuckDB // yields HUGEINT (windowed SUM widens first); " +
          s"CAST the result on the same line: ${bad.mkString(" | ")}")
    }
  }
}
