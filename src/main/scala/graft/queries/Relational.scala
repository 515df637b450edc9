package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp

/** Relational query surface (SURVEY.md §2.C) — the capabilities the
  * reference exposes through its ad-hoc SQL tool (`query_heap`, see
  * /root/reference/mcp_server/server.py) and its report queries,
  * proven on the TPC-H-ish testdata with DuckDB oracles.
  *
  * Money arithmetic is done in DECIMAL (exact, engine-portable) and
  * cast to DOUBLE only at the end; doubles summed in engine-specific
  * orders would not hash-match.
  */
object Relational {

  private val D = DecimalType(12, 2)
  private def dec(c: String) = col(c).cast(D)
  private val one = lit(1).cast(D)

  /** C2 — TPC-H Q1 shape: wide groupBy aggregate with decimal sums. */
  val q1PricingSummary: GateQuery = GateQuery(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-06-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    // fanOut was TRIED here in r16 and reverted: unlike q_stats (12
    // BigDecimal products/row, 0.62× with fanOut) q1's cost is the
    // scan+decode itself, and the added exchange read back at parity
    // to slightly worse across A/Bs — the shuffle buys nothing the
    // partial aggregate needed (guide §2.3's cost test, failed).
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(Timestamp.valueOf("2000-06-01 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (one - dec("l_discount"))).cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (one - dec("l_discount")) * (one + dec("l_tax"))).cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** C1 — projection + selective filter; both must reach the parquet
    * scan (PushedFilters / 3-column ReadSchema).
    */
  val qFilterPushdown: GateQuery = GateQuery(
    "q_filter_pushdown",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(Timestamp.valueOf("2000-01-01 00:00:00")) &&
        col("l_quantity") >= 45)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** C6 — TPC-H Q6 shape: selective scan into a single decimal agg. */
  val q6Revenue: GateQuery = GateQuery(
    "q6_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec("l_extendedprice") * dec("l_discount")).cast("double").as("revenue"))
  }

  /** C13/B1 — summary counts: total rows, exact distinct, filtered count. */
  val qSummary: GateQuery = GateQuery(
    "q_summary",
    """SELECT COUNT(*) AS total_rows,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders").agg(
      count(lit(1)).as("total_rows"),
      countDistinct(col("o_custkey")).as("n_customers"),
      count(when(col("o_orderstatus") === "F", 1)).as("n_finished"))
  }

  /** C3 — TPC-H Q3 shape: 3-way join, group, top-k by revenue.
    * Customer/orders sides are broadcast at dimension scale; the
    * lineitem side stays partitioned (shuffle only on the join key).
    */
  val q3ShippingPriority: GateQuery = GateQuery(
    "q3_shipping_priority",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS DATE) AS orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val cust = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(s, dir, "orders")
      .filter(col("o_orderdate") < lit(Timestamp.valueOf("1998-01-01 00:00:00")))
    val li = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit(Timestamp.valueOf("1998-01-01 00:00:00")))
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount"))).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate").cast("date").as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** C4 — semi-join (EXISTS): orders with at least one late lineitem. */
  val qSemiJoin: GateQuery = GateQuery(
    "q_semi_join",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val ord = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(Timestamp.valueOf("1997-01-01 00:00:00")))
    val li = Tables(s, dir, "lineitem")
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** C5 — TPC-H Q5 shape: star join across 6 tables, dims broadcast. */
  val q5LocalSupplier: GateQuery = GateQuery(
    "q5_local_supplier",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
    val ord = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(Timestamp.valueOf("1998-01-01 00:00:00")))
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** C7 — anti-join (NOT EXISTS): customers with no recent orders. */
  val qAntiJoin: GateQuery = GateQuery(
    "q_anti_join",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val recent = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(Timestamp.valueOf("2000-01-01 00:00:00")))
    Tables(s, dir, "customer")
      .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** C12 — left outer join + null-aware aggregation. */
  val qOuterJoin: GateQuery = GateQuery(
    "q_outer_join",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
      |FROM customer
      |LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec("o_totalprice")), lit(0).cast(D)).cast("double").as("total_spent"))
      .orderBy("c_custkey")
  }

  /** C8 — window top-N per group: 3 priciest orders per customer. */
  val qWindowTopN: GateQuery = GateQuery(
    "q_window_topn",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** C9 — running sum + lag over a per-customer order timeline. */
  val qWindowRunning: GateQuery = GateQuery(
    "q_window_running",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  COALESCE(CAST(LAG(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE), -1.0) AS prev_price
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(s, dir, "orders")
      .withColumn("running_total",
        sum(dec("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
      .withColumn("prev_price", coalesce(lag(dec("o_totalprice"), 1).over(w).cast("double"), lit(-1.0)))
      .select("o_custkey", "o_orderkey", "running_total", "prev_price")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** C10 — distinct projection. */
  val qDistinct: GateQuery = GateQuery(
    "q_distinct",
    """SELECT DISTINCT o_orderstatus, o_orderpriority
      |FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .select("o_orderstatus", "o_orderpriority").distinct()
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** C11 — union all of two conformed projections. */
  val qUnion: GateQuery = GateQuery(
    "q_union",
    """SELECT kind, key, CAST(bal AS DOUBLE) AS bal FROM (
      |  SELECT 'cust' AS kind, c_custkey AS key, CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer
      |  UNION ALL
      |  SELECT 'supp' AS kind, s_suppkey AS key, CAST(s_acctbal AS DECIMAL(12,2)) AS bal FROM supplier) t
      |ORDER BY kind, key""".stripMargin) { (s, dir) =>
    val cust = Tables(s, dir, "customer")
      .select(lit("cust").as("kind"), col("c_custkey").as("key"), dec("c_acctbal").as("bal"))
    val supp = Tables(s, dir, "supplier")
      .select(lit("supp").as("kind"), col("s_suppkey").as("key"), dec("s_acctbal").as("bal"))
    cust.unionAll(supp)
      .select(col("kind"), col("key"), col("bal").cast("double").as("bal"))
      .orderBy("kind", "key")
  }

  /** C17 — rollup over nation/status with grouping id. */
  val qRollup: GateQuery = GateQuery(
    "q_rollup",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(dec("o_totalprice")).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")
  }

  /** C15 — exact median (interpolated) of an exact-2-decimal column.
    * Portable because o_totalprice values are exact at 2 decimals and
    * both engines interpolate the same two neighbors.
    */
  val qPercentile: GateQuery = GateQuery(
    "q_percentile",
    """SELECT o_orderpriority,
      |  CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS median_price,
      |  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
      |  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .orderBy("o_orderpriority")
  }

  /** C19 — scalar subquery: orders above the global average price. */
  val qScalarSub: GateQuery = GateQuery(
    "q_scalar_sub",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val ord = Tables(s, dir, "orders")
    val avgDf = ord.agg((sum(dec("o_totalprice")).cast("double") / count(lit(1))).as("avg_price"))
    ord.join(broadcast(avgDf))
      .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** C17b — full cube with grouping ids (beyond rollup: all 4
    * grouping-set combinations).
    */
  val qCube: GateQuery = GateQuery(
    "q_cube",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority, gid""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg((grouping(col("o_orderstatus")) + lit(2) * grouping(col("o_orderpriority"))).as("gid"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"))
      .orderBy("status", "priority", "gid")
  }

  /** C15b — approximate percentile sketch, HASH-MATCHED via its error
    * guarantee: a sketch value can't equal an oracle, but the sketch
    * CONTRACT can. approx_percentile(accuracy=1000) guarantees rank
    * error <= N/1000; the gate emits the exact discrete quantiles at
    * ±2/1000 around each target (deterministic, oracle-computable)
    * plus `within_bounds` = approx ∈ [lo, hi]. The oracle asserts
    * TRUE — so the gate FAILS if the sketch ever violates its bound.
    */
  val qApproxPercentile: GateQuery = GateQuery(
    "q_approx_percentile",
    """WITH b AS (
      |  SELECT o_orderpriority,
      |    quantile_disc(o_totalprice, 0.248) AS lo0, quantile_disc(o_totalprice, 0.252) AS hi0,
      |    quantile_disc(o_totalprice, 0.498) AS lo1, quantile_disc(o_totalprice, 0.502) AS hi1,
      |    quantile_disc(o_totalprice, 0.948) AS lo2, quantile_disc(o_totalprice, 0.952) AS hi2
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 0 AS q_idx, lo0 AS lo, hi0 AS hi, TRUE AS within_bounds FROM b
      |UNION ALL
      |SELECT o_orderpriority, 1, lo1, hi1, TRUE FROM b
      |UNION ALL
      |SELECT o_orderpriority, 2, lo2, hi2, TRUE FROM b
      |ORDER BY o_orderpriority, q_idx""".stripMargin) { (s, dir) =>
    def disc(p: Double) =
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY o_totalprice)")
    val agg = Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.95), 1000)").as("qs"),
        disc(0.248).as("lo0"), disc(0.252).as("hi0"),
        disc(0.498).as("lo1"), disc(0.502).as("hi1"),
        disc(0.948).as("lo2"), disc(0.952).as("hi2"))
    agg.select(col("o_orderpriority"), explode(array(
        struct(lit(0).as("q_idx"), element_at(col("qs"), 1).as("approx"),
          col("lo0").as("lo"), col("hi0").as("hi")),
        struct(lit(1).as("q_idx"), element_at(col("qs"), 2).as("approx"),
          col("lo1").as("lo"), col("hi1").as("hi")),
        struct(lit(2).as("q_idx"), element_at(col("qs"), 3).as("approx"),
          col("lo2").as("lo"), col("hi2").as("hi")))).as("r"))
      .select(col("o_orderpriority"), col("r.q_idx").as("q_idx"),
        col("r.lo").as("lo"), col("r.hi").as("hi"),
        (col("r.approx") >= col("r.lo") && col("r.approx") <= col("r.hi"))
          .as("within_bounds"))
      .orderBy("o_orderpriority", "q_idx")
  }

  /** C21b — DETERMINISTIC sampling: salted-hash rank, top-5 per
    * return flag. A pure function of (seed, data) — engine-portable,
    * so unlike TABLESAMPLE this sample hash-matches the oracle.
    */
  val qSampleDeterministic: GateQuery = GateQuery(
    "q_sample_det",
    """WITH t AS (
      |  SELECT l_returnflag, l_orderkey, l_linenumber,
      |    -- mirror of Sampling.hashRank: length-prefixed tokens, NULL -> 'N'
      |    CASE WHEN l_orderkey IS NULL THEN 'N'
      |         ELSE CAST(length(CAST(l_orderkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR) END AS tok1,
      |    CASE WHEN l_linenumber IS NULL THEN 'N'
      |         ELSE CAST(length(CAST(l_linenumber AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) END AS tok2
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, l_orderkey, l_linenumber,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY md5('42' || '-' || tok1 || '-' || tok2),
      |               l_orderkey, l_linenumber) AS sample_rk
      |  FROM t)
      |SELECT l_returnflag, l_orderkey, l_linenumber, sample_rk
      |FROM r WHERE sample_rk <= 5
      |ORDER BY l_returnflag, sample_rk""".stripMargin) { (s, dir) =>
    import graft.operators.Sampling
    // fanOut (r16): deterministicPerGroup's phase-1 per-slice prune is
    // partitioned by (group, spark_partition_id()) — on the
    // single-task scan every row landed in ONE slice, so phase 1
    // degenerated to a full per-group sort of the table (3 tasks,
    // 600k md5 ranks). Fanned to the cluster width, each slice sorts
    // ~1/32nd and only 5·slices·groups survivors reach phase 2. The
    // survivor set is slicing-invariant (spec-pinned), so results are
    // identical. No-op on a real multi-split layout.
    Sampling.deterministicPerGroup(
        Tables.fanOut(
          Tables(s, dir, "lineitem").select("l_returnflag", "l_orderkey", "l_linenumber")),
        groupCols = Seq("l_returnflag"), keyCols = Seq("l_orderkey", "l_linenumber"),
        n = 5, seed = 42L)
      .orderBy("l_returnflag", "sample_rk")
  }

  /** C15+ — discrete percentiles (no interpolation: the answer is an
    * actual data value) via WITHIN GROUP ordered-set aggregate syntax.
    */
  val qPercentileDisc: GateQuery = GateQuery(
    "q_percentile_disc",
    """SELECT l_returnflag,
      |  quantile_disc(l_quantity, 0.5) AS med_disc,
      |  quantile_disc(l_quantity, 0.9) AS p90_disc,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_disc,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_disc,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  /** C8+ — top-k per group via the k-bounded typed Aggregator (same
    * results as window ROW_NUMBER, but partial-aggregated: only
    * k·groups rows shuffle instead of the whole table).
    */
  val qTopKAgg: GateQuery = GateQuery(
    "q_topk_agg",
    """WITH r AS (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |SELECT o_orderpriority, o_orderkey, o_totalprice, rk
      |FROM r WHERE rk <= 3
      |ORDER BY o_orderpriority, rk""".stripMargin) { (s, dir) =>
    import graft.operators.TopK
    TopK.topKPerGroup(Tables(s, dir, "orders"),
        groupCol = "o_orderpriority", scoreCol = "o_totalprice",
        idCol = "o_orderkey", k = 3)
      .orderBy("o_orderpriority", "rk")
  }

  /** C-surface `sample` — seeded Bernoulli TABLESAMPLE, HASH-MATCHED
    * via its statistical contract (the same move as the sketch gates):
    * engines draw different rows, but any correct Bernoulli(p) sampler
    * must land each group's count inside a ±6σ binomial corridor
    * around n·p, which the oracle computes exactly from the FULL
    * table. The draw is seed-deterministic, so within_bounds is stable
    * — and a broken sampler (wrong p, correlated draws) FAILS the
    * gate. (In-Spark determinism is additionally spec-tested.)
    */
  val qSample: GateQuery = GateQuery(
    "q_sample",
    """SELECT l_returnflag,
      |  COUNT(*) AS n_total,
      |  CAST(floor(COUNT(*) * 0.1 - 6 * sqrt(COUNT(*) * 0.1 * 0.9)) AS BIGINT) AS lo,
      |  CAST(ceil(COUNT(*) * 0.1 + 6 * sqrt(COUNT(*) * 0.1 * 0.9)) AS BIGINT) AS hi,
      |  TRUE AS within_bounds
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val sampled = Tables(s, dir, "lineitem")
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_sampled"))
    val totals = Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_total"))
    val sigma = sqrt(col("n_total") * 0.1 * 0.9)
    totals.join(sampled, Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("n_total"),
        floor(col("n_total") * 0.1 - lit(6) * sigma).cast("long").as("lo"),
        ceil(col("n_total") * 0.1 + lit(6) * sigma).cast("long").as("hi"),
        (coalesce(col("n_sampled"), lit(0L)) >=
            floor(col("n_total") * 0.1 - lit(6) * sigma) &&
          coalesce(col("n_sampled"), lit(0L)) <=
            ceil(col("n_total") * 0.1 + lit(6) * sigma)).as("within_bounds"))
      .orderBy("l_returnflag")
  }

  /** C22 — pivot: status × priority count matrix. Oracle is portable
    * conditional aggregation (identical column names/values).
    */
  val qPivot: GateQuery = GateQuery(
    "q_pivot",
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")
  }

  /** C23 — unpivot/melt back to long form. Oracle: stacked UNION ALL. */
  val qUnpivot: GateQuery = GateQuery(
    "q_unpivot",
    """SELECT o_orderpriority, kind, CAST(v AS DOUBLE) AS v FROM (
      |  SELECT o_orderpriority, 'total' AS kind, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS v FROM orders GROUP BY 1
      |  UNION ALL
      |  SELECT o_orderpriority, 'maxim' AS kind, CAST(MAX(o_totalprice) AS DOUBLE) AS v FROM orders GROUP BY 1) t
      |ORDER BY o_orderpriority, kind""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(sum(dec("o_totalprice")).cast("double").as("total"),
        max("o_totalprice").cast("double").as("maxim"))
      .unpivot(Array(col("o_orderpriority")), Array(col("total"), col("maxim")), "kind", "v")
      .orderBy("o_orderpriority", "kind")
  }

  /** C24 — statistical aggregates, HASH-MATCHED: raw moments (Σx, Σx²,
    * Σx³, Σx⁴, Σxy) accumulate in DECIMAL — exact, so fold order can't
    * diverge between engines — and corr/covar/stddev/var/skew/kurt are
    * derived from the double-cast moments with textually identical
    * formulas on both sides (only +,-,*,/,sqrt: all IEEE
    * correctly-rounded, unlike pow). StatsMomentSpec pins these to
    * Spark's builtin corr/stddev/skewness within float tolerance.
    */
  val qStats: GateQuery = GateQuery(
    "q_stats",
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE) AS sxxx,
      |    CAST(SUM((CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_quantity AS DECIMAL(6,2))) * (CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_quantity AS DECIMAL(6,2)))) AS DOUBLE) AS sxxxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(6,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sd,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sdd,
      |    CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS st,
      |    CAST(SUM(CAST(l_tax AS DECIMAL(4,2)) * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS stt
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr_qty_price,
      |  round((sxy - sx * sy / n) / (n - 1), 6) AS covar_qp,
      |  round(sqrt((sdd - sd * sd / n) / (n - 1)), 12) AS sd_disc,
      |  round((stt - st * st / n) / (n - 1), 12) AS var_tax,
      |  round((sxxx / n - 3 * (sx / n) * (sxx / n) + 2 * (sx / n) * (sx / n) * (sx / n))
      |    / ((sxx / n - (sx / n) * (sx / n)) * sqrt(sxx / n - (sx / n) * (sx / n))), 12) AS skew_qty,
      |  round((sxxxx / n - 4 * (sx / n) * (sxxx / n) + 6 * (sx / n) * (sx / n) * (sxx / n)
      |      - 3 * (sx / n) * (sx / n) * (sx / n) * (sx / n))
      |    / ((sxx / n - (sx / n) * (sx / n)) * (sxx / n - (sx / n) * (sx / n))) - 3, 12) AS kurt_qty
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val qd = col("l_quantity").cast(DecimalType(6, 2))
    val pd = col("l_extendedprice").cast(DecimalType(12, 2))
    val dd = col("l_discount").cast(DecimalType(4, 2))
    val td = col("l_tax").cast(DecimalType(4, 2))
    // fanOut (r16): 12 BigDecimal moment products per row in the
    // partial aggregate, previously serialized on the single scan
    // task — same move and invariance argument as q1_pricing_summary
    val m = Tables.fanOut(Tables(s, dir, "lineitem"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(qd).cast("double").as("sx"),
        sum(qd * qd).cast("double").as("sxx"),
        sum(qd * qd * qd).cast("double").as("sxxx"),
        sum((qd * qd) * (qd * qd)).cast("double").as("sxxxx"),
        sum(pd).cast("double").as("sy"),
        sum(pd * pd).cast("double").as("syy"),
        sum(qd * pd).cast("double").as("sxy"),
        sum(dd).cast("double").as("sd"),
        sum(dd * dd).cast("double").as("sdd"),
        sum(td).cast("double").as("st"),
        sum(td * td).cast("double").as("stt"))
    val n = col("n"); val sx = col("sx"); val sxx = col("sxx")
    val sxxx = col("sxxx"); val sxxxx = col("sxxxx")
    val sy = col("sy"); val syy = col("syy"); val sxy = col("sxy")
    val sd = col("sd"); val sdd = col("sdd"); val st = col("st"); val stt = col("stt")
    val mean = sx / n
    val m2 = sxx / n - mean * mean
    // derived stats are rounded (12 dp; covar 6 dp): the DERIVATION is
    // exact-decimal, but a >2^53 moment's decimal→double cast can
    // differ by one ulp between engines; ~1e-15 relative noise is far
    // below the rounding grain, so the hash stays stable
    m.select(
      col("l_returnflag"), n.cast("long").as("n"),
      round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
        .as("corr_qty_price"),
      round((sxy - sx * sy / n) / (n - lit(1)), 6).as("covar_qp"),
      round(sqrt((sdd - sd * sd / n) / (n - lit(1))), 12).as("sd_disc"),
      round((stt - st * st / n) / (n - lit(1)), 12).as("var_tax"),
      round((sxxx / n - lit(3) * mean * (sxx / n) + lit(2) * mean * mean * mean)
        / (m2 * sqrt(m2)), 12).as("skew_qty"),
      round((sxxxx / n - lit(4) * mean * (sxxx / n) + lit(6) * mean * mean * (sxx / n)
          - lit(3) * mean * mean * mean * mean)
        / (m2 * m2) - lit(3), 12).as("kurt_qty"))
      .orderBy("l_returnflag")
  }

  /** C14 — HLL approx distinct (sketch result; rows-only gate).
    * Two-level form: pre-distinct the (flag, partkey) pairs, then
    * count + sketch the deduped rows. Equivalent (HLL registers are
    * duplicate-insensitive; COUNT over distinct pairs == COUNT
    * DISTINCT) but avoids mixing exact-distinct and sketch in one
    * aggregate, which plans as an Expand that doubles every shuffled
    * row — the difference between N and 2N shuffle bytes at 100 TB.
    */
  val qApproxDistinct: GateQuery = GateQuery(
    "q_approx_distinct",
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  CAST(floor(COUNT(DISTINCT l_partkey) * 0.94) AS BIGINT) AS lo,
      |  CAST(ceil(COUNT(DISTINCT l_partkey) * 1.06) AS BIGINT) AS hi,
      |  TRUE AS within_bounds
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    // HASH-MATCHED via the sketch contract (same move as
    // q_approx_percentile): the HLL++ estimate itself is not oracle-
    // reproducible, but rsd=0.02 bounds it; the gate emits the exact
    // count, the ±3·rsd corridor, and within_bounds — the oracle
    // asserts TRUE, so a sketch drifting outside its guarantee FAILS.
    Tables(s, dir, "lineitem")
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        floor(col("exact_parts") * 0.94).cast("long").as("lo"),
        ceil(col("exact_parts") * 1.06).cast("long").as("hi"),
        (col("approx_parts") >= floor(col("exact_parts") * 0.94) &&
          col("approx_parts") <= ceil(col("exact_parts") * 1.06)).as("within_bounds"))
      .orderBy("l_returnflag")
  }

  /** One bucketed copy of orders⨝lineitem per (JVM, sf-dir): the
    * write-side shuffle is paid once; every probe of the pair after
    * that is Exchange-free (BucketingSpec asserts the plan shape).
    */
  private val bucketedCache = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def bucketedTables(s: org.apache.spark.sql.SparkSession, dir: String): (String, String) =
    bucketedCache.computeIfAbsent(dir, _ => {
      val tag = s"${ProcessHandle.current().pid()}_${new java.io.File(dir).getName.replace('.', '_')}"
      val (ot, lt) = (s"g_bkt_orders_$tag", s"g_bkt_lineitem_$tag")
      graft.operators.Bucketing.writeBucketed(
        Tables(s, dir, "orders").select("o_orderkey", "o_orderstatus"), ot, "o_orderkey", 8)
      graft.operators.Bucketing.writeBucketed(
        Tables(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        lt, "o_orderkey", 8)
      (ot, lt)
    })

  /** E13 — co-located bucketed fact-fact join: both sides pre-bucketed
    * on the join key, joined with zero Exchange, and the RESULT is
    * what DuckDB must reproduce from the raw tables — proving the
    * bucketed layout changes the plan, never the answer.
    */
  val qBucketedJoin: GateQuery = GateQuery(
    "q_bucketed_join",
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val (ot, lt) = bucketedTables(s, dir)
    graft.operators.Bucketing.bucketedJoin(s, ot, lt, "o_orderkey")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(dec("l_quantity")).cast("double").as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  /** D17 — salted skew join: the fact side spreads every key across 8
    * salt buckets (dim replicated 8x), and the aggregate over the
    * salted join must equal DuckDB's plain join — salting may only
    * move rows between tasks, never change the result.
    */
  val qSkewJoin: GateQuery = GateQuery(
    "q_skew_join",
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val fact = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"), col("l_linenumber"))
    val dim = Tables(s, dir, "orders").select("o_orderkey", "o_orderstatus")
    graft.operators.Skew.saltedJoin(fact, dim, "o_orderkey",
        saltBuckets = 8, factSaltSource = col("l_linenumber"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(dec("l_extendedprice")).cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  /** C49 — runtime-bloom-filtered join: a selective dim-side filter
    * injects a `bloom_filter_agg` subquery whose `might_contain`
    * prunes fact rows BEFORE the join shuffle — at 100 TB the
    * difference between shuffling 2% of lineitem and all of it. The
    * local thresholds hide the feature (defaults engage past multi-GB
    * scans), so the gate pins injection explicitly: it plans under a
    * lowered application-side threshold and FAILS if the optimizer
    * stops injecting the filter. The oracle is the plain join — a
    * bloom has no false negatives, so the runtime filter must be
    * semantically invisible.
    */
  val qBloomJoin: GateQuery = GateQuery(
    "q_bloom_join",
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val j = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(dec("l_quantity")).cast("double").as("total_qty"))
        .orderBy("o_orderpriority")
      val opt = j.queryExecution.optimizedPlan.toString
      require(opt.contains("bloom_filter_agg") && opt.contains("might_contain"),
        "runtime bloom filter was not injected:\n" + opt)
      j
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  val all: Seq[GateQuery] = Seq(
    q1PricingSummary, qFilterPushdown, q6Revenue, qSummary,
    q3ShippingPriority, qSemiJoin, q5LocalSupplier, qAntiJoin, qOuterJoin,
    qWindowTopN, qWindowRunning, qDistinct, qUnion, qRollup, qCube,
    qPercentile, qApproxPercentile, qScalarSub, qApproxDistinct, qSample,
    qSampleDeterministic, qTopKAgg, qPercentileDisc, qPivot, qUnpivot, qStats,
    qBucketedJoin, qSkewJoin, qBloomJoin)
}
