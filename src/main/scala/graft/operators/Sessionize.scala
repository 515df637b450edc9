package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (SURVEY.md §2.E2): a new session starts when
  * the gap to the previous event of the same user exceeds
  * `gapSeconds`. One shuffle on user_id; everything after is
  * window-local. The streaming variant lives in
  * graft.streaming.StreamingSessionize.
  */
object Sessionize {

  /** Ordering for events within a user: ts, plus `tieCol` as a
    * deterministic tiebreaker when the DataFrame has it.
    */
  private def eventOrder(events: DataFrame, tsCol: String, tieCol: String) =
    if (events.columns.contains(tieCol)) Seq(col(tsCol), col(tieCol))
    else Seq(col(tsCol))

  def sessionStarts(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(eventOrder(events, tsCol, tieCol): _*)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    events.withColumn("is_new_session",
      when(prev.isNull || unix_micros(col(tsCol)) - prev > gapSeconds * 1000000L, 1)
        .otherwise(0))
  }

  /** Per-user session and event counts. */
  def userSessions(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieCol: String = "event_id"): DataFrame =
    sessionStarts(events, userCol, tsCol, gapSeconds, tieCol)
      .groupBy(userCol)
      .agg(sum("is_new_session").as("n_sessions"), count(lit(1)).as("n_events"))

  /** Session-level table: one row per (user, session) with bounds and
    * event count. Session ids are a running sum over the session-start
    * flags — still one shuffle on the user key; everything else is
    * window-local then a partial-aggregable groupBy.
    */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(eventOrder(events, tsCol, tieCol): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessionStarts(events, userCol, tsCol, gapSeconds, tieCol)
      .withColumn("session_id", sum("is_new_session").over(w))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"))
  }
}
