package graft.heap

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Named analysis sessions over exported heap directories — the
  * Spark-side equivalent of the reference MCP server's session
  * registry (mcp_server/server.py: open_session / list_sessions /
  * close_session / cleanup_session, heap_state.py SessionManager).
  *
  * A session binds a session id to a heap parquet directory with its
  * tables registered as temp views under `<id>__<table>`; `query`
  * additionally registers the bare names for the most-recently-used
  * session so ad-hoc SQL stays terse. Closing drops the views and
  * keeps the files; cleanup also deletes the directory (and requires
  * `confirm = true`, mirroring the reference's destructive-op guard).
  */
final class HeapSessions(spark: SparkSession) {

  final case class Session(id: String, dir: String, tables: Seq[String])

  private val sessions = mutable.LinkedHashMap.empty[String, Session]

  /** Open (or reopen) a session over an exported heap directory. */
  def open(parquetDir: String, sessionId: String = ""): Session = synchronized {
    val f = new java.io.File(parquetDir)
    require(f.isDirectory, s"directory not found: $parquetDir")
    val id = if (sessionId.nonEmpty) sessionId else f.getName
    val views = HeapSql.register(spark, parquetDir)
    views.keys.foreach { v =>
      spark.table(v).createOrReplaceTempView(s"${id}__$v")
    }
    val sess = Session(id, parquetDir, views.keys.toSeq.sorted)
    sessions(id) = sess
    sess
  }

  def list: Seq[Session] = synchronized(sessions.values.toSeq)

  /** Per-table file/row/schema listing (reference list_parquet_files). */
  def listTables(sessionId: String): DataFrame = {
    val sess = get(sessionId)
    new HeapTables(spark, sess.dir).list
  }

  /** SQL against one session's tables (bare table names resolve). */
  def query(sessionId: String, sql: String): DataFrame = {
    val sess = get(sessionId)
    HeapSql.register(spark, sess.dir) // bare names → this session
    spark.sql(sql)
  }

  /** Drop the session's views; parquet files stay on disk. */
  def close(sessionId: String): Unit = synchronized {
    val sess = get(sessionId)
    sess.tables.foreach(v => spark.catalog.dropTempView(s"${sess.id}__$v"))
    sessions.remove(sessionId)
  }

  /** Close AND delete the parquet directory. Destructive — requires
    * confirm (reference cleanup_session semantics).
    */
  def cleanup(sessionId: String, confirm: Boolean = false): Unit = {
    require(confirm, "destructive operation - pass confirm = true to delete files")
    val dir = get(sessionId).dir
    close(sessionId)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }

  private def get(sessionId: String): Session = synchronized {
    sessions.getOrElse(sessionId,
      throw new NoSuchElementException(
        s"no session '$sessionId' (open sessions: ${sessions.keys.mkString(", ")})"))
  }
}
