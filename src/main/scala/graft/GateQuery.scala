package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gate query: a Spark program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB on the same parquet
  * tables. Oracle-less queries get a weaker rows-only check.
  *
  * Portability rules (SURVEY.md §6): identical column aliases on both
  * sides, deterministic total ORDER BY, money math in DECIMAL cast to
  * DOUBLE at the end, no raw double aggregates, md5 as the portable
  * hash, no sub-microsecond timestamp semantics.
  *
  * Bench tiers: `bench` gates time every round in the fast tier;
  * `slow` gates (iterative harnesses, multi-commit index builds) are
  * timed too — in a separate tier the bench reports under
  * `slow_total` so a regression in e.g. k-core or the curation
  * composition can never ship silently — but their minute-scale cost
  * is kept out of the fast-tier `value` round-over-round signal.
  * Streaming and demo-heap gates stay out of both tiers: micro-batch
  * fixed latency and a KB-sized demo dump measure harness overhead,
  * not operator throughput (heap throughput gets its own dedicated
  * 150 MB ingest bench instead).
  */
final case class GateQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean,
    slow: Boolean = false)

object GateQuery {
  def apply(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, Some(sql), bench = true)

  def apply(name: String, sql: String, bench: Boolean)(
      fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, Some(sql), bench)

  def apply(name: String, sql: String, bench: Boolean, slow: Boolean)(
      fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, Some(sql), bench, slow)

  /** A correctness gate whose wall-clock belongs in the slow bench
    * tier: measured and recorded every round, but not summed into the
    * fast-tier total.
    */
  def slowTier(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, Some(sql), bench = false, slow = true)

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, None, bench = true)
}
