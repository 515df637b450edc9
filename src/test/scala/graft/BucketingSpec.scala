package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-join contract is a PLAN property: same results as the
  * plain join, but no Exchange on either side (the bucket-local Sort
  * Spark 3+ inserts is expected — scans don't advertise sort order by
  * default — and costs no network).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without Exchange") {
    val orders = Tables(spark, sf, "orders")
    val lineitem = Tables(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), plan) // scan really is bucketed

      // identical results to the unbucketed join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() === expected)

      // and an aggregate on the bucket key also skips the exchange
      val agg = spark.table("b_lineitem").groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$aggPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("mismatched bucket counts still answer correctly (with shuffle)") {
    val orders = Tables(spark, sf, "orders").limit(100)
    Bucketing.writeBucketed(orders, "b_o8", "o_orderkey", 8)
    Bucketing.writeBucketed(orders.select("o_orderkey", "o_totalprice"), "b_o4", "o_orderkey", 4)
    try {
      val j = Bucketing.bucketedJoin(spark, "b_o8", "b_o4", "o_orderkey")
      assert(j.count() === 100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_o8")
      spark.sql("DROP TABLE IF EXISTS b_o4")
    }
  }
}
