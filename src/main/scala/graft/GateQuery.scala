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
  */
final case class GateQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean)

object GateQuery {
  def apply(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, Some(sql), bench = true)

  def apply(name: String, sql: String, bench: Boolean)(
      fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, Some(sql), bench)

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): GateQuery =
    GateQuery(name, fn, None, bench = true)
}
