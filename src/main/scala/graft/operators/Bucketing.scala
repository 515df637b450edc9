package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed storage for co-located fact-fact joins (SURVEY.md §5):
  * two tables bucketed the same way on the join key join WITHOUT any
  * exchange — at 100 TB that deletes the dominant shuffle of every
  * recurring key-equijoin. Bucket pruning also serves point lookups.
  */
object Bucketing {

  /** Persist `df` bucketed+sorted by `keyCol` as a catalog table. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key —
    * shuffle-free by construction (verify: no Exchange in the plan).
    */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
