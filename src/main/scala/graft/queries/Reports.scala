package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Report-style gate queries (SURVEY.md §2.B right column): the same
  * relational plan shapes the reference's report/waste queries use
  * (`scripts/analyze_heap_parquet.py`), proven on the TPC-H-ish
  * testdata with DuckDB oracles. The heap-table versions of these
  * plans live in graft.heap.HeapAnalysis; these gates prove the
  * operator shapes against an independent engine.
  */
object Reports {

  private val D = DecimalType(12, 2)
  private def dec(c: String) = col(c).cast(D)

  /** B2 — top types by count (run_top_types shape: group, count,
    * order desc, limit).
    */
  val qTopGroups: GateQuery = GateQuery(
    "q_top_groups",
    """SELECT p_type, COUNT(*) AS obj_count
      |FROM part
      |GROUP BY p_type
      |ORDER BY obj_count DESC, p_type
      |LIMIT 30""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part")
      .groupBy("p_type").agg(count(lit(1)).as("obj_count"))
      .orderBy(col("obj_count").desc, col("p_type"))
      .limit(30)
  }

  /** B3/C16 — CASE/LIKE category buckets (run_category_breakdown
    * shape: cascading LIKE classifier then group-count).
    */
  val qCaseBuckets: GateQuery = GateQuery(
    "q_case_buckets",
    """SELECT CASE
      |    WHEN p_type LIKE 'PROMO%' THEN 'promo'
      |    WHEN p_type LIKE '%BRUSHED%' THEN 'brushed'
      |    WHEN p_type LIKE '%STEEL' THEN 'steel'
      |    ELSE 'other' END AS category,
      |  COUNT(*) AS obj_count
      |FROM part
      |GROUP BY category
      |ORDER BY obj_count DESC, category""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part")
      .withColumn("category",
        when(col("p_type").like("PROMO%"), "promo")
          .when(col("p_type").like("%BRUSHED%"), "brushed")
          .when(col("p_type").like("%STEEL"), "steel")
          .otherwise("other"))
      .groupBy("category").agg(count(lit(1)).as("obj_count"))
      .orderBy(col("obj_count").desc, col("category"))
  }

  /** B4 — size histogram (run_byte_array_distribution shape: bucketed
    * CASE on a size expression, count + sum per bucket).
    */
  val qHistogram: GateQuery = GateQuery(
    "q_histogram",
    """SELECT CASE
      |    WHEN l_quantity < 10 THEN '0-9'
      |    WHEN l_quantity < 25 THEN '10-24'
      |    WHEN l_quantity < 40 THEN '25-39'
      |    ELSE '40+' END AS bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM lineitem
      |GROUP BY bucket
      |ORDER BY total_price DESC""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .withColumn("bucket",
        when(col("l_quantity") < 10, "0-9")
          .when(col("l_quantity") < 25, "10-24")
          .when(col("l_quantity") < 40, "25-39")
          .otherwise("40+"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(dec("l_extendedprice")).cast("double").as("total_price"))
      .orderBy(col("total_price").desc)
  }

  /** B5/C18 — global top-N by size (run_large_byte_arrays shape:
    * filter, order desc, limit — a distributed top-k).
    */
  val qLargeTopN: GateQuery = GateQuery(
    "q_large_topn",
    """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS size_val
      |FROM orders
      |WHERE o_totalprice > 400000
      |ORDER BY size_val DESC, o_orderkey
      |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_totalprice").cast("double").as("size_val"))
      .orderBy(col("size_val").desc, col("o_orderkey"))
      .limit(20)
  }

  /** B6 — duplicate-strings shape: join fact→payload, md5-group,
    * HAVING count>1, waste arithmetic ((n-1)*len summed).
    */
  val qDupStrings: GateQuery = GateQuery(
    "q_dup_strings",
    """WITH joined AS (
      |  SELECT md5(d.text) AS hash, len(d.text) AS str_len
      |  FROM documents d),
      |dups AS (
      |  SELECT hash, COUNT(*) AS dup_count, MIN(str_len) AS str_len
      |  FROM joined GROUP BY hash HAVING COUNT(*) > 1)
      |SELECT CAST(SUM(dup_count) AS BIGINT) AS total_dup_strings,
      |  CAST(SUM((dup_count - 1) * str_len) AS BIGINT) AS wasted_bytes,
      |  COUNT(*) AS unique_dup_values,
      |  MAX(dup_count) AS max_dups_single_value
      |FROM dups""".stripMargin) { (s, dir) =>
    val dups = Tables(s, dir, "documents")
      .select(md5(col("text").cast("binary")).as("hash"), length(col("text")).as("str_len"))
      .groupBy("hash")
      .agg(count(lit(1)).as("dup_count"), min("str_len").as("str_len"))
      .filter(col("dup_count") > 1)
    dups.agg(
      sum(col("dup_count")).as("total_dup_strings"),
      sum((col("dup_count") - 1) * col("str_len")).as("wasted_bytes"),
      count(lit(1)).as("unique_dup_values"),
      max(col("dup_count")).as("max_dups_single_value"))
  }

  /** B11 — collection-sizing shape: join parent→backing store, ratio
    * predicate, count + waste sum (check_collection_sizing).
    */
  val qJoinRatio: GateQuery = GateQuery(
    "q_join_ratio",
    """SELECT COUNT(*) AS n_sparse,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS wasted,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS avg_util
      |FROM orders o
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_linenumber = 1
      |  AND CAST(l.l_quantity AS DOUBLE) / CAST(o.o_totalprice AS DOUBLE) < 0.0002""".stripMargin) { (s, dir) =>
    val ord = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem").filter(col("l_linenumber") === 1)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_quantity").cast("double") / col("o_totalprice").cast("double") < 0.0002)
      .agg(
        count(lit(1)).as("n_sparse"),
        sum(dec("o_totalprice")).cast("double").as("wasted"),
        (sum(dec("l_quantity")).cast("double") / sum(dec("o_totalprice")).cast("double")).as("avg_util"))
  }

  /** B12 — duplicate-payload waste rollup (check_duplicate_byte_arrays
    * shape: hash-group bounded payloads, waste = (n-1)*len).
    */
  val qDupGroupWaste: GateQuery = GateQuery(
    "q_dup_group_waste",
    """WITH hashed AS (
      |  SELECT md5(source) AS hash, len(source) AS arr_len
      |  FROM documents
      |  WHERE len(source) > 0 AND len(source) <= 10240),
      |dups AS (
      |  SELECT hash, COUNT(*) AS dup_count, MIN(arr_len) AS arr_len
      |  FROM hashed GROUP BY hash HAVING COUNT(*) > 1)
      |SELECT hash, dup_count, arr_len, (dup_count - 1) * arr_len AS wasted
      |FROM dups
      |ORDER BY wasted DESC, hash""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .filter(length(col("source")) > 0 && length(col("source")) <= 10240)
      .select(md5(col("source").cast("binary")).as("hash"), length(col("source")).as("arr_len"))
      .groupBy("hash")
      .agg(count(lit(1)).as("dup_count"), min("arr_len").as("arr_len"))
      .filter(col("dup_count") > 1)
      .withColumn("wasted", (col("dup_count") - 1) * col("arr_len"))
      .orderBy(col("wasted").desc, col("hash"))
  }

  /** D66 — declarative data-quality constraint suite (the Deequ
    * shape): 4 row-level rules in ONE conditional-sum scan, a key-
    * uniqueness rule (one grouped aggregate), and a referential-
    * integrity rule (one anti-join vs distinct o_orderkey). The
    * (l_orderkey, l_linenumber) key is genuinely non-unique in
    * testdata and quantity>30 genuinely occurs — the gate exercises
    * BOTH the pass and fail branches with real violation counts.
    */
  val qConstraints: GateQuery = GateQuery(
    "q_constraints",
    """WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem),
      |rows AS (
      |  SELECT 'not_null_l_shipdate' AS constraint_name,
      |    COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS violations FROM lineitem
      |  UNION ALL
      |  SELECT 'range_l_quantity',
      |    COUNT(*) FILTER (WHERE l_quantity IS NOT NULL
      |      AND (l_quantity < 1 OR l_quantity > 30)) FROM lineitem
      |  UNION ALL
      |  SELECT 'range_l_discount',
      |    COUNT(*) FILTER (WHERE l_discount IS NOT NULL
      |      AND (l_discount < 0 OR l_discount > 0.1)) FROM lineitem
      |  UNION ALL
      |  SELECT 'set_l_returnflag',
      |    COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
      |      AND l_returnflag NOT IN ('A', 'N', 'R')) FROM lineitem
      |  UNION ALL
      |  SELECT 'unique_line_key',
      |    CAST(COALESCE((SELECT SUM(c) FROM (
      |      SELECT COUNT(*) AS c FROM lineitem
      |      GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)), 0) AS BIGINT)
      |  UNION ALL
      |  SELECT 'fk_orders',
      |    (SELECT COUNT(*) FROM lineitem l
      |     WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
      |       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
      |SELECT constraint_name, n_rows, CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS passed
      |FROM rows CROSS JOIN n
      |ORDER BY constraint_name""".stripMargin) { (s, dir) =>
    import graft.operators.Quality
    val li = Tables(s, dir, "lineitem")
    Quality.check(li,
      rules = Seq(
        Quality.notNull("l_shipdate"),
        Quality.inRange("l_quantity", lit(1), lit(30)),
        Quality.inRange("l_discount", lit(0), lit(0.1)),
        Quality.inSet("l_returnflag", Seq("A", "N", "R"))),
      uniqueKeys = Seq(("unique_line_key", Seq("l_orderkey", "l_linenumber"))),
      foreignKeys = Seq(("fk_orders", "l_orderkey",
        Tables(s, dir, "orders"), "o_orderkey")))
      .orderBy("constraint_name")
  }

  /** D91 — one-row-per-column dataset profile (Deequ/TFDV column
    * statistics): row/null/exact-distinct counts and typed min/max per
    * column of the documents table. The profile is what tells you
    * which constraints to write; counts are exact and min/max keep
    * typed (numeric) comparison order, rendered as strings after the
    * aggregate.
    */
  val qProfile: GateQuery = GateQuery(
    "q_profile",
    """WITH p AS (
      |  SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
      |    CAST(COUNT(*) FILTER (WHERE doc_id IS NULL) AS BIGINT) AS n_null,
      |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
      |    CAST(MIN(doc_id) AS VARCHAR) AS min_val,
      |    CAST(MAX(doc_id) AS VARCHAR) AS max_val
      |  FROM documents
      |  UNION ALL
      |  SELECT 'lang', COUNT(*),
      |    CAST(COUNT(*) FILTER (WHERE lang IS NULL) AS BIGINT),
      |    CAST(COUNT(DISTINCT lang) AS BIGINT),
      |    MIN(lang), MAX(lang) FROM documents
      |  UNION ALL
      |  SELECT 'n_chars', COUNT(*),
      |    CAST(COUNT(*) FILTER (WHERE n_chars IS NULL) AS BIGINT),
      |    CAST(COUNT(DISTINCT n_chars) AS BIGINT),
      |    CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'source', COUNT(*),
      |    CAST(COUNT(*) FILTER (WHERE source IS NULL) AS BIGINT),
      |    CAST(COUNT(DISTINCT source) AS BIGINT),
      |    MIN(source), MAX(source) FROM documents)
      |SELECT col_name, n_rows, n_null, n_distinct, min_val, max_val
      |FROM p ORDER BY col_name""".stripMargin) { (s, dir) =>
    graft.operators.Quality.profile(Tables(s, dir, "documents"),
        Seq("doc_id", "lang", "n_chars", "source"))
      .orderBy("col_name")
  }

  val all: Seq[GateQuery] = Seq(
    qTopGroups, qCaseBuckets, qHistogram, qLargeTopN,
    qDupStrings, qJoinRatio, qDupGroupWaste, qConstraints, qProfile)
}
