package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §5). AQE's skew-join
  * handles most cases at runtime; explicit salting is for the
  * pathological key whose single value exceeds what one task should
  * own even after AQE splits — e.g. the null-ish placeholder id that
  * is 30% of a 100 TB fact table.
  */
object Skew {

  /** Inner-join `fact` to `dim` on `key`, spreading each fact key
    * across `saltBuckets` partitions. The fact side salts
    * deterministically by row content hash; the dim side replicates
    * each row `saltBuckets` times — the classic replicate-broadcastish
    * trade: dim grows k-fold, the hot key's work spreads k ways.
    * Result equals the plain join (verified in SkewSpec).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, factSaltSource: Column): DataFrame = {
    require(saltBuckets > 0)
    val f = fact.withColumn("__salt", pmod(hash(factSaltSource), lit(saltBuckets)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then merge per key. Spark's hash aggregate already
    * does map-side partials; this adds an extra REDUCE-side split so
    * one hot key's merge work is shared by `saltBuckets` tasks.
    * `aggs` maps column -> (partial, merge) aggregate builders.
    */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum("__partial").as("n"))
}
