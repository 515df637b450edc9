package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key (inclusive), or nulls when
  * none. Spark has no native ASOF; the composition is the
  * scale-correct one: tag + union both sides, ONE shuffle on the key,
  * then a running `last_value(ignoreNulls)` carries the most recent
  * right values forward in time order. No range self-join, no
  * per-row probe — cost is a sort within key partitions.
  */
object AsOf {

  /** @param leftCols  left columns carried to the output
    * @param rightCols right columns emitted as `asof_<name>` (taken
    *                  from the latest right row at or before left.ts)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftCols: Seq[String], rightCols: Seq[String]): DataFrame =
    asOfImpl(left, right, key, ts, leftCols, rightCols, backward = true)

  /** FORWARD as-of — for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` (inclusive) on the same key: the
    * "next reading at or after" lookup (next heartbeat after an
    * alert, first fill after an order). Same one-shuffle union +
    * running-carry shape as the backward join, just time-reversed —
    * the carry runs over a DESCENDING order so it holds the earliest
    * later right row.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftCols: Seq[String], rightCols: Seq[String]): DataFrame =
    asOfImpl(left, right, key, ts, leftCols, rightCols, backward = false)

  private def asOfImpl(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftCols: Seq[String], rightCols: Seq[String], backward: Boolean): DataFrame = {
    // All right columns travel as ONE struct so the window's
    // last(ignoreNulls) picks a single right ROW atomically — per-column
    // carry would mix values from different rows whenever the latest
    // matching row holds a null in one column.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l = left.select(
      (col(key) +: col(ts).as("__ts") +: lit(0).as("__is_r") +:
        leftCols.map(col)) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      (col(key) +: col(ts).as("__ts") +: lit(1).as("__is_r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
    // right rows sort BEFORE left rows at equal ts → inclusive match;
    // forward mode reverses the time order so the carry holds the
    // EARLIEST right row at-or-after each left row
    val timeOrd = if (backward) col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(key).orderBy(timeOrd, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_r") === 0)
      .select((col(key) +: col("__ts").as(ts) +: leftCols.map(col)) ++
        rightCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
