package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join. A naive `l.ts BETWEEN r.start AND
  * r.end` equi-keyless join degenerates to a per-key cross product;
  * the scale path buckets time: intervals replicate into each bucket
  * they overlap (cheap — bounded by interval span / bucket width),
  * points join on (key, bucket) — an EQUI join Spark hash-partitions —
  * and the exact BETWEEN filter runs inside the join. Pick the bucket
  * width near the median interval span so replication stays O(1).
  */
object RangeJoin {

  /** @param points    (key, ptCol, …) table
    * @param intervals (key, startCol, endCol, …) table, inclusive ends
    * @param bucketUs  bucket width in the ts unit (e.g. micros)
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      ptCol: String, startCol: String, endCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs" +
      " (pmod/div by 0 would null every bucket and silently match nothing)")
    // Exact integer floor-division for bucket assignment: `/` is double
    // division and rounds above 2^53 in the ts unit, which would put a
    // point and its interval in adjacent buckets and silently drop the
    // match. (x - pmod(x, b)) is divisible by b, so `div` is exact, and
    // pmod keeps the floor semantics for negative timestamps.
    def bucketOf(c: String) =
      expr(s"(`$c` - pmod(`$c`, ${bucketUs}L)) div ${bucketUs}L")
    val iv = intervals
      .filter(col(startCol) <= col(endCol)) // invalid intervals match nothing
      .withColumn("__bucket", explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    val pt = points.withColumn("__bucket", bucketOf(ptCol))
    pt.join(iv, Seq(key, "__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
