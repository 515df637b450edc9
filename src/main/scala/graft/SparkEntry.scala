package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Events, Events2, Graphs, Heap, Pipeline, Relational, Reports, SqlSurface, StreamingGates}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are defined in graft.queries.* and registered here.
  */
object SparkEntry {

  /** Every gate query, in SURVEY.md §2 order. */
  def gateQueries: Seq[GateQuery] = Seq(
    Relational.all, SqlSurface.all, Reports.all, Pipeline.all, Events.all,
    Events2.all, Graphs.all, StreamingGates.all, Heap.all).flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    gateQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    gateQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
