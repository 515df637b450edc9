package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_stats derives corr/covar/stddev/var/skew/kurt from exact DECIMAL
  * moments (for engine-portable hashing); this spec pins those derived
  * values to Spark's builtin statistical aggregates, so the gate can't
  * drift from the semantics it claims to implement.
  */
class StatsMomentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def relClose(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("moment-derived stats match Spark builtin aggregates") {
    val got = SparkEntry.queries("q_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val ref = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("corr_qty_price"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("covar_qp"),
        stddev_samp(col("l_discount")).as("sd_disc"),
        var_samp(col("l_tax")).as("var_tax"),
        skewness(col("l_quantity")).as("skew_qty"),
        kurtosis(col("l_quantity")).as("kurt_qty"))
      .collect()
    assert(ref.nonEmpty)
    ref.foreach { r =>
      val g = got(r.getString(0))
      for (c <- Seq("corr_qty_price", "covar_qp", "sd_disc", "var_tax", "skew_qty", "kurt_qty")) {
        val expected = r.getAs[Double](c)
        val actual = g.getAs[Double](c)
        assert(relClose(actual, expected),
          s"${r.getString(0)}.$c: moment-derived $actual vs builtin $expected")
      }
    }
  }
}
