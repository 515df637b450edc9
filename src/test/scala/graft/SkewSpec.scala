package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join/aggregate correctness: same results as the plain
  * plans, with the hot key spread across salt buckets.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin equals plain join on a skewed fact") {
    import spark.implicits._
    // a deliberately skewed fact: 90% of rows hit nation 0
    val fact = (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) i % 25 else 0))
      .toDF("row_id", "n_nationkey")
    val dim = Tables(spark, sf, "nation")
    val plain = fact.join(dim, Seq("n_nationkey"))
      .select("row_id", "n_name").orderBy("row_id").collect()
    val salted = Skew.saltedJoin(fact, dim, "n_nationkey", 8, col("row_id"))
      .select("row_id", "n_name").orderBy("row_id").collect()
    assert(salted.toSeq === plain.toSeq)
    assert(salted.length === 2000)
  }

  test("saltedCount equals plain groupBy count") {
    val li = Tables(spark, sf, "lineitem")
    val plain = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(li, "l_returnflag", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("registerAll enables spark.sql over testdata") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus = 'F'""".stripMargin).collect()(0).getLong(0)
    assert(n > 0)
  }
}
