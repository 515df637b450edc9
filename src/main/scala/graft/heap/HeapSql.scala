package graft.heap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc SQL over an exported heap directory — the counterpart of
  * the reference's `query_heap` MCP tool (mcp_server: arbitrary SQL
  * over the heap parquet files). Registers every table as a temp view
  * so `spark.sql(...)` has the full relational surface; class tables
  * get sanitized names (dots and brackets → underscores) plus the
  * stable aliases the checks use.
  */
object HeapSql {

  def viewName(table: String): String =
    table.replaceAll("[^A-Za-z0-9_]", "_")

  /** Register all tables under `dir`; returns view-name → table-dir.
    * Class tables with multiple loader copies union under one view.
    */
  def register(spark: SparkSession, dir: String): Map[String, String] = {
    val f = new java.io.File(dir)
    val dirs = Option(f.listFiles()).map(_.toSeq.filter(_.isDirectory).map(_.getName)).getOrElse(Nil)
    val (system, classes) = dirs.partition(_.startsWith("_"))

    val systemViews = system.map { d =>
      val v = viewName(d)
      spark.read.parquet(s"$dir/$d").createOrReplaceTempView(v)
      v -> d
    }
    // group loader copies: "java.lang.String_4242" -> "java.lang.String"
    val classViews = classes.groupBy(d => d.replaceAll("_\\d+$", "")).map {
      case (cls, copies) =>
        val v = viewName(cls)
        // Same-named classes from different loaders can have different
        // field layouts; allowMissingColumns keeps one mismatched copy
        // from failing registration of the whole SQL surface.
        copies.map(c => spark.read.parquet(s"$dir/$c"))
          .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
          .createOrReplaceTempView(v)
        v -> copies.mkString(",")
    }
    (systemViews ++ classViews).toMap
  }

  def query(spark: SparkSession, dir: String, sql: String): DataFrame = {
    register(spark, dir)
    spark.sql(sql)
  }
}
