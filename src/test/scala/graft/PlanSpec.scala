package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY.md §5): filters and projections must
  * reach the parquet scan, dimension joins must broadcast, and the
  * scan must read only the needed columns. These are the properties
  * that survive a 100x scale-up; asserting them keeps regressions out.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_filter_pushdown: filters pushed, 3-column read schema") {
    val plan = planOf("q_filter_pushdown")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(l_quantity"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    // projection pruned to the 3 output + 2 filter columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"), readSchema)
  }

  test("q1: partial aggregation before the exchange") {
    val plan = planOf("q1_pricing_summary")
    assert(plan.contains("HashAggregate"), plan)
    // map-side partial agg: two HashAggregates around one shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("LessThanOrEqual(l_shipdate"), plan)
  }

  test("q3/q5: dimension sides broadcast, fact side stays partitioned") {
    val p3 = planOf("q3_shipping_priority")
    assert(p3.contains("BroadcastHashJoin"), p3)
    assert(!p3.contains("SortMergeJoin"), p3)
    val p5 = planOf("q5_local_supplier")
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 4, p5)
  }

  test("q6: selective scan pushes all three predicates") {
    val plan = planOf("q6_revenue")
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    assert(plan.contains("LessThan(l_shipdate"), plan)
    assert(plan.contains("LessThan(l_quantity"), plan)
  }

  test("semi/anti joins stay semi/anti (no row explosion)") {
    assert(planOf("q_semi_join").contains("LeftSemi"), planOf("q_semi_join"))
    assert(planOf("q_anti_join").contains("LeftAnti"), planOf("q_anti_join"))
  }

  test("whole-stage codegen covers the dot-product pair loop") {
    val df = SparkEntry.queries("q_neardup_embedding")(spark, sf)
    val formatted = df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("dot_product"), formatted)
    // scoring happens inside the join (no separate interpreted
    // projection stage for the similarity)
    assert(formatted.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin")), formatted)
  }

  test("knn queries broadcast the query side") {
    assert(planOf("q_knn_bruteforce").contains("BroadcastNestedLoopJoin") ||
      planOf("q_knn_bruteforce").contains("BroadcastHashJoin"))
    assert(planOf("q_knn_lsh").contains("BroadcastHashJoin"))
  }
}
