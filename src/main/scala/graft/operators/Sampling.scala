package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators. Unlike Bernoulli TABLESAMPLE
  * (whose draws are engine- and partitioning-dependent), hash-rank
  * sampling is a pure function of the data: rank rows by a salted
  * content hash and keep the top n per group. Same rows on every
  * engine, every cluster size, every run — which makes samples
  * reproducible AND oracle-checkable, a property training-data
  * pipelines want for eval splits and debugging slices.
  *
  * Scale shape: one shuffle on the group key; the per-group sort is
  * window-local. For n≪group size a pre-filter could bound the sort,
  * but the hash rank is already the cheapest total order available.
  */
object Sampling {

  /** md5 over the concatenated key columns with a seed salt — the
    * portable rank (identical string in DuckDB's md5). Each key is
    * LENGTH-PREFIXED (`len:value`) so adjacent keys can't alias
    * across the separator (("a-b","c") vs ("a","b-c")), and NULL maps
    * to the token `N` — unambiguous, since every non-null token
    * starts with a digit — instead of being silently skipped.
    */
  def hashRank(seed: Long, keys: Column*): Column = {
    val toks = keys.map { k =>
      val s = k.cast("string")
      when(s.isNull, lit("N"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    md5(concat_ws("-", (lit(seed.toString) +: toks): _*).cast("binary"))
  }

  /** Top-`n` rows per group by salted hash rank. Ties (hash
    * collisions) break on the key columns themselves, so the result
    * is a total function of (seed, data).
    */
  def deterministicPerGroup(df: DataFrame, groupCols: Seq[String],
      keyCols: Seq[String], n: Int, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashRank(seed, keyCols.map(col): _*) +: keyCols.map(col): _*)
    df.withColumn("sample_rk", row_number().over(w))
      .filter(col("sample_rk") <= n)
  }
}
