package graft.queries

import graft.{GateQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended relational SQL surface (SURVEY.md §2.C25–C34): set
  * operations, grouping sets, value-window functions, string/date
  * function families, filtered aggregation, ordered string
  * aggregation, mixed equi/theta joins, correlated EXISTS, and
  * null-semantics operators — each hash-matched against DuckDB.
  *
  * Engine-parity notes: integer COUNT/SUM outputs are BIGINT on both
  * sides (DuckDB SUM(int) would be HUGEINT → float64 in the driver's
  * pandas compare); regexp_replace is global-by-default in Spark so
  * the DuckDB side passes the 'g' flag; string position functions are
  * 1-based with 0-for-absent in both engines.
  */
object SqlSurface {

  /** C25 — INTERSECT (distinct set semantics in both engines). */
  val qIntersect: GateQuery = GateQuery(
    "q_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  /** C25 — EXCEPT: customers that never placed an urgent order (the
    * set-op twin of the anti join; non-empty at every test SF).
    */
  val qExcept: GateQuery = GateQuery(
    "q_except",
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "customer").select("c_custkey")
      .except(Tables(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
  }

  /** C17+ — explicit GROUPING SETS (beyond rollup/cube): two
    * single-column sets plus the grand total, via the SQL surface.
    */
  val qGroupingSets: GateQuery = GateQuery(
    "q_grouping_sets",
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderpriority, o_orderstatus, n""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderpriority, o_orderstatus, n""".stripMargin)
  }

  /** C9+ — value window functions: lag/lead/ntile/first_value over a
    * per-customer time order.
    */
  val qWindowFuncs: GateQuery = GateQuery(
    "q_window_funcs",
    """SELECT o_orderkey, o_custkey,
      |  LAG(o_orderkey) OVER w AS prev_order,
      |  LEAD(o_orderkey) OVER w AS next_order,
      |  NTILE(4) OVER w AS quartile,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        lag("o_orderkey", 1).over(w).as("prev_order"),
        lead("o_orderkey", 1).over(w).as("next_order"),
        ntile(4).over(w).as("quartile"),
        first("o_orderkey").over(w).as("first_order"),
        col("o_orderdate"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      .drop("o_orderdate")
  }

  /** C16+ — string function family: case, replace, substring,
    * position, reverse, padding, regexp rewrite.
    */
  val qStringFuncs: GateQuery = GateQuery(
    "q_string_funcs",
    """SELECT p_partkey,
      |  upper(p_name) AS uname,
      |  replace(p_name, ' ', '_') AS underscored,
      |  substr(p_name, 1, 5) AS prefix5,
      |  strpos(p_name, 'a') AS first_a,
      |  reverse(p_type) AS rtype,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
      |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred
      |FROM part
      |WHERE p_partkey <= 500
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part")
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("underscored"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        instr(col("p_name"), "a").as("first_a"),
        reverse(col("p_type")).as("rtype"),
        lpad(col("p_size").cast("string"), 4, "0").as("padded"),
        regexp_replace(col("p_name"), lit("[aeiou]"), lit("*")).as("starred"))
      .orderBy("p_partkey")
  }

  /** C-date — temporal function family over the timestamp order date:
    * component extraction, truncation, month end, day arithmetic.
    */
  val qDateFuncs: GateQuery = GateQuery(
    "q_date_funcs",
    """SELECT o_orderkey,
      |  year(o_orderdate) AS y,
      |  month(o_orderdate) AS m,
      |  day(o_orderdate) AS d,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
      |FROM orders
      |WHERE o_orderkey <= 20000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") <= 20000)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"))
      .orderBy("o_orderkey")
  }

  /** C13+ — filtered aggregation (FILTER clause / count_if) alongside
    * exact distinct counting per group.
    */
  val qCondAgg: GateQuery = GateQuery(
    "q_cond_agg",
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      |  COUNT(DISTINCT o_custkey) AS n_cust,
      |  MAX(o_totalprice) AS max_price,
      |  MIN(o_orderdate) AS first_date
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
        countDistinct(col("o_custkey")).as("n_cust"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_orderdate")).as("first_date"))
      .orderBy("o_orderpriority")
  }

  /** C-listagg — ordered string aggregation: deterministic because
    * both sides sort the aggregated values by the same key.
    */
  val qListAgg: GateQuery = GateQuery(
    "q_listagg",
    """SELECT r_regionkey, r_name,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  COUNT(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_regionkey, r_name
      |ORDER BY r_regionkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "nation")
      .join(Tables(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_regionkey", "r_name")
      .agg(
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_regionkey")
  }

  /** C-theta — mixed equi + inequality join: hash join on the equi key
    * with the theta predicate as a residual filter (never a cross
    * product — scale-safe).
    */
  val qThetaJoin: GateQuery = GateQuery(
    "q_theta_join",
    """SELECT p_partkey, COUNT(*) AS n_heavy
      |FROM lineitem JOIN part
      |  ON l_partkey = p_partkey AND l_quantity > p_size
      |GROUP BY p_partkey
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem").select("l_partkey", "l_quantity")
    Tables(s, dir, "part").select("p_partkey", "p_size")
      .join(li, col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_heavy"))
      .orderBy("p_partkey")
  }

  /** C4+ — correlated EXISTS with an extra predicate, through the
    * spark.sql surface (same SQL text runs on both engines).
    */
  private val existsSql =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  val qExistsCorr: GateQuery = GateQuery("q_exists_corr", existsSql) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(existsSql)
  }

  /** C-null — null-production and null-safe comparison: NULLIF,
    * COALESCE, IS NOT DISTINCT FROM (Spark `<=>`).
    */
  val qNullSemantics: GateQuery = GateQuery(
    "q_null_semantics",
    """SELECT o_orderkey,
      |  NULLIF(o_orderstatus, 'O') AS status_or_null,
      |  (o_orderstatus IS NOT DISTINCT FROM 'F') AS is_f,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label
      |FROM orders
      |WHERE o_orderkey <= 20000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val statusOrNull = when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_orderstatus"))
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") <= 20000)
      .select(col("o_orderkey"),
        statusOrNull.as("status_or_null"),
        (col("o_orderstatus") <=> "F").as("is_f"),
        coalesce(statusOrNull, lit("open")).as("status_label"))
      .orderBy("o_orderkey")
  }

  /** C8++ — ranking-function family: rank, dense_rank, percent_rank,
    * cume_dist. The window order is UNIQUE (price, then key), so the
    * fractional ranks are exact integer ratios — engine-portable.
    */
  val qRankFuncs: GateQuery = GateQuery(
    "q_rank_funcs",
    """SELECT o_orderkey,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drk,
      |  CAST(PERCENT_RANK() OVER w AS DOUBLE) AS prk,
      |  CAST(CUME_DIST() OVER w AS DOUBLE) AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir, "orders")
      .select(col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drk"),
        percent_rank().over(w).as("prk"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_orderkey")
  }

  /** C20+ — array-function family over tokenized text: sort, distinct,
    * slice, element access, stringify. Binary string collation on both
    * engines, so sorts agree.
    */
  val qArrayFuncs: GateQuery = GateQuery(
    "q_array_funcs",
    """SELECT doc_id,
      |  len(list_distinct(string_split(text, ' '))) AS n_unique,
      |  list_sort(list_distinct(string_split(text, ' ')))[1] AS first_sorted,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first3,
      |  string_split(text, ' ')[-1] AS last_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        size(array_distinct(col("ws"))).as("n_unique"),
        element_at(array_sort(array_distinct(col("ws"))), 1).as("first_sorted"),
        concat_ws(" ", slice(col("ws"), 1, 3)).as("first3"),
        element_at(col("ws"), -1).as("last_token"))
      .orderBy("doc_id")
  }

  /** C25b — bag-semantics set ops (EXCEPT ALL keeps multiplicity:
    * a part ordered 5× by 'R' and 2× by 'A' survives 3×).
    */
  val qExceptAll: GateQuery = GateQuery(
    "q_except_all",
    """SELECT l_partkey, COUNT(*) AS n FROM (
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      |  EXCEPT ALL
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
      |GROUP BY l_partkey
      |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
    li.filter(col("l_returnflag") === "R").select("l_partkey")
      .exceptAll(li.filter(col("l_returnflag") === "A").select("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .orderBy("l_partkey")
  }

  /** C16b — schema-typed JSON parsing (from_json to a struct, not
    * string extraction) aggregated per event type.
    */
  val qJsonStruct: GateQuery = GateQuery(
    "q_json_struct",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val parsed = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
    Tables(s, dir, "events")
      .select(col("event_type"), parsed.getField("k").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")
  }

  /** C38 — RANGE window frame over a TIME interval: per customer, the
    * rolling 30-day order total ending at each order's date. RANGE
    * (peer-inclusive, value-based) is a genuinely different frame
    * semantics from ROWS — ties on the order date aggregate together
    * regardless of row order, so no tiebreak column is needed for
    * determinism. DECIMAL sum, cast to DOUBLE at the edge.
    */
  val qWindowRange: GateQuery = GateQuery(
    "q_window_range",
    """SELECT o_orderkey, o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS rolling_30d
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("""CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                |  PARTITION BY o_custkey ORDER BY o_orderdate
                |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)""".stripMargin)
          .as("rolling_30d"))
      .orderBy("o_orderkey")
  }

  /** C39 — IGNORE NULLS window semantics as last-observation-carried-
    * forward: sparse readings (value < 20 nulled) gap-filled with the
    * latest non-null per user. The window orders by the SAME
    * micro-truncated instant both engines see (epoch_us mirror of the
    * Spark loader's nanos→micros division).
    */
  val qIgnoreNulls: GateQuery = GateQuery(
    "q_ignore_nulls",
    """WITH e AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN value < 20 THEN NULL ELSE value END AS v
      |  FROM events)
      |SELECT event_id, user_id, v,
      |  LAST_VALUE(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen
      |FROM e
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .withColumn("v", when(col("value") < 20, lit(null)).otherwise(col("value")))
      .select(col("event_id"), col("user_id"), col("v"),
        last(col("v"), ignoreNulls = true).over(w).as("last_seen"))
      .orderBy("event_id")
  }

  /** C40/C41 — non-parquet source interop: the documents slice is
    * written by SPARK as CSV (header, quoted) / JSONL (newline-
    * delimited), read back with an explicit schema, and aggregated;
    * the oracle makes DUCKDB parse the SAME files — so the gate pins
    * cross-engine wire-format compatibility (quoting, headers, JSON
    * types), not just both engines' parquet paths. Files are written
    * once per (format, sfdir) per JVM; bench repeats therefore time
    * the steady-state read+aggregate.
    */
  private val fmtDirs = scala.collection.concurrent.TrieMap.empty[String, String]

  private def writeOnce(s: org.apache.spark.sql.SparkSession, dir: String,
      fmt: String): String =
    fmtDirs.getOrElseUpdate(s"$fmt:$dir", {
      val out = fmtPath(fmt, dir)
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      val w = docs.write.mode("overwrite")
      fmt match {
        case "csv"  => w.option("header", "true").csv(out)
        case "orc"  => w.orc(out)
        case "zstd" => w.option("compression", "zstd").parquet(out)
        case "text" => docs.select(col("text")).write.mode("overwrite").text(out)
        case _      => w.json(out)
      }
      out
    })

  private def fmtPath(fmt: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${fmt}_${ProcessHandle.current().pid()}/${new java.io.File(dir).getName}"

  private val roundtripSchema = "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING"

  private def roundtripAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_id"), sum(length(col("text"))).as("sum_len"))
      .orderBy("lang")

  private def roundtripOracle(src: String): String =
    s"""SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  MIN(doc_id) AS min_id, CAST(SUM(len(text)) AS BIGINT) AS sum_len
       |FROM $src
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  val qCsvRoundtrip: GateQuery = {
    // pid-scoped dir (the ivfIndexDir move); '*' spans the one sf this
    // JVM verifies
    val glob =
      s"${System.getProperty("java.io.tmpdir")}/graft_csv_${ProcessHandle.current().pid()}/{SF_BASE}/*.csv"
    GateQuery("q_csv_roundtrip", roundtripOracle(
      s"""read_csv('$glob', header=true,
         |  columns={'doc_id':'BIGINT','lang':'VARCHAR','n_chars':'BIGINT','text':'VARCHAR'})""".stripMargin)) { (s, dir) =>
      val out = writeOnce(s, dir, "csv")
      roundtripAgg(s.read.schema(roundtripSchema).option("header", "true").csv(out))
    }
  }

  val qJsonlRoundtrip: GateQuery = {
    val glob =
      s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_${ProcessHandle.current().pid()}/{SF_BASE}/*.json"
    GateQuery("q_jsonl_roundtrip", roundtripOracle(
      s"""read_json('$glob', format='newline_delimited',
         |  columns={'doc_id':'BIGINT','lang':'VARCHAR','n_chars':'BIGINT','text':'VARCHAR'})""".stripMargin)) { (s, dir) =>
      val out = writeOnce(s, dir, "jsonl")
      roundtripAgg(s.read.schema(roundtripSchema).json(out))
    }
  }

  /** C42 — ORC source interop: the documents slice round-trips through
    * Spark's ORC writer/reader (the second columnar wire format after
    * parquet — warehouse migrations read both). DuckDB has no ORC
    * reader, so unlike C40/C41 the oracle takes the PARQUET truth
    * directly: the gate is the cross-format identity — any row, value,
    * or encoding lost in the ORC write→read cycle breaks the aggregate
    * hash against the parquet-derived answer.
    */
  val qOrcRoundtrip: GateQuery = GateQuery(
    "q_orc_roundtrip", roundtripOracle("documents")) { (s, dir) =>
    val out = writeOnce(s, dir, "orc")
    roundtripAgg(s.read.schema(roundtripSchema).orc(out))
  }

  /** C43 — zstd-compressed parquet interop: the 100 TB storage
    * default (zstd ≈ gzip ratios at snappy-class read speed). Spark
    * WRITES zstd parquet, DuckDB PARSES THE SAME FILES — so the gate
    * pins cross-engine codec compatibility of the written pages, not
    * just both engines' own codec paths.
    */
  val qZstdRoundtrip: GateQuery = {
    val glob =
      s"${System.getProperty("java.io.tmpdir")}/graft_zstd_${ProcessHandle.current().pid()}/{SF_BASE}/*.parquet"
    GateQuery("q_zstd_roundtrip",
      roundtripOracle(s"read_parquet('$glob')")) { (s, dir) =>
      val out = writeOnce(s, dir, "zstd")
      roundtripAgg(s.read.parquet(out))
    }
  }

  /** C44 — raw text-file source (one document per line — the
    * lowest-common-denominator corpus interchange format): Spark
    * writes `text`, reads it back, and proves content identity via an
    * ORDER-INSENSITIVE integer content hash (sum of md5 prefixes —
    * line files carry no ids and no ordering guarantee across
    * writers). Oracle takes the parquet truth: any line lost, split,
    * or altered in the text cycle shifts the sum.
    */
  val qTextRoundtrip: GateQuery = GateQuery(
    "q_text_roundtrip",
    """SELECT COUNT(*) AS n_lines,
      |  CAST(SUM(len(text)) AS BIGINT) AS sum_len,
      |  CAST(SUM(('0x' || substr(md5(text), 1, 12))::BIGINT) AS BIGINT) AS content_sum
      |FROM documents""".stripMargin) { (s, dir) =>
    val out = writeOnce(s, dir, "text")
    s.read.text(out)
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("value"))).as("sum_len"),
        sum(conv(substring(md5(col("value").cast("binary")), 1, 12), 16, 10)
          .cast("long")).as("content_sum"))
  }

  /** C46 — schema-evolution read (mergeSchema / union-by-name): two
    * parquet vintages of the documents slice — v1 (doc_id, lang,
    * n_chars) written BEFORE a `source` column existed, v2 carrying
    * the new column AND a different physical column order — read back
    * as ONE table. By-name resolution (never positional) plus
    * null-filling for the pre-evolution files is the contract every
    * long-lived 100 TB table depends on: schemas evolve in place, old
    * files are never rewritten. The oracle reads the SAME
    * engine-written files via union_by_name, so a positional mixup or
    * a dropped null-fill breaks the hash.
    */
  val qSchemaEvolution: GateQuery = {
    // {SF_BASE} is substituted by Verify at dump time: the oracle must
    // read only THIS sf-dir's evolution fixture, exactly like the
    // engine side (a bare * aggregates every sf-dir in one JVM)
    val glob =
      s"${System.getProperty("java.io.tmpdir")}/graft_evo_${ProcessHandle.current().pid()}/{SF_BASE}"
    GateQuery("q_schema_evolution",
      s"""WITH u AS (
         |  SELECT * FROM read_parquet(
         |    ['$glob/v1/*.parquet', '$glob/v2/*.parquet'], union_by_name=true))
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  COALESCE(MIN(source), '') AS first_source
         |FROM u GROUP BY lang
         |ORDER BY lang""".stripMargin) { (s, dir) =>
      val out = fmtDirs.getOrElseUpdate(s"evo:$dir", {
        val p = fmtPath("evo", dir)
        val docs = Tables(s, dir, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$p/v1")
        docs.filter(col("doc_id") % 2 === 1) // evolved: new column, new order
          .select(col("source"), col("doc_id"), col("n_chars"), col("lang"))
          .write.mode("overwrite").parquet(s"$p/v2")
        p
      })
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_legacy"),
          sum("n_chars").as("sum_chars"),
          coalesce(min("source"), lit("")).as("first_source"))
        .orderBy("lang")
    }
  }

  /** C50 — RECURSIVE CTE (Spark 4.x WITH RECURSIVE): hierarchical
    * ancestor rollup over the implicit binary tree on customer keys
    * (parent = key div 2) — every customer's chain climbs ~14 levels
    * to the root, and each tree node aggregates the customers whose
    * chain passes through it. Strictly-decreasing keys make the
    * recursion provably terminating in both engines; the only dialect
    * difference is integer division spelling (`div` vs `//`).
    */
  val qRecursiveCte: GateQuery = GateQuery(
    "q_recursive_cte",
    """WITH RECURSIVE anc AS (
      |  SELECT c_custkey AS node, c_nationkey FROM customer
      |  UNION ALL
      |  SELECT CAST(node // 2 AS BIGINT) AS node, c_nationkey FROM anc
      |  WHERE node > 1)
      |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_desc,
      |  CAST(SUM(c_nationkey) AS BIGINT) AS nat_sum
      |FROM anc GROUP BY node
      |ORDER BY node""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """WITH RECURSIVE anc AS (
        |  SELECT c_custkey AS node, c_nationkey FROM customer
        |  UNION ALL
        |  SELECT CAST(node div 2 AS BIGINT) AS node, c_nationkey FROM anc
        |  WHERE node > 1)
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_desc,
        |  CAST(SUM(c_nationkey) AS BIGINT) AS nat_sum
        |FROM anc GROUP BY node
        |ORDER BY node""".stripMargin)
  }

  /** C51 — VARIANT semi-structured type (Spark 4.x): `parse_json`
    * ONCE into the binary-encoded variant, then typed `variant_get`
    * access — the scale-right semi-structured path (per-field
    * re-parsing of the JSON string, get_json_object style, re-lexes
    * the payload for every extraction; variant parses once and every
    * access is a typed offset read). The oracle states the same
    * semantics over DuckDB's JSON functions.
    */
  val qVariant: GateQuery = GateQuery(
    "q_variant",
    """SELECT event_type,
      |  CAST(COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS BIGINT) AS n_hi,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """WITH v AS (SELECT event_type, parse_json(props) AS pv FROM events)
        |SELECT event_type,
        |  COUNT(*) FILTER (WHERE variant_get(pv, '$.k', 'long') > 50) AS n_hi,
        |  SUM(variant_get(pv, '$.k', 'long')) AS sum_k,
        |  MAX(variant_get(pv, '$.k', 'long')) AS max_k
        |FROM v
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
  }

  /** C52 — SQL pipe syntax (Spark 4.x `|>`): the linear FROM-first
    * dataflow dialect. Same relational semantics, so the oracle is
    * ordinary SQL — the gate pins that the pipe surface parses, plans,
    * and aggregates identically (incl. the post-aggregation WHERE,
    * pipe's HAVING).
    */
  val qPipeSql: GateQuery = GateQuery(
    "q_pipe_sql",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem
      |WHERE l_quantity > 30
      |GROUP BY l_returnflag, l_linestatus
      |HAVING COUNT(*) > 10
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """FROM lineitem
        ||> WHERE l_quantity > 30
        ||> AGGREGATE COUNT(*) AS n GROUP BY l_returnflag, l_linestatus
        ||> WHERE n > 10
        ||> SELECT l_returnflag, l_linestatus, n
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** C45 — LATERAL correlated subquery join (top-N-per-group stated
    * as a join, the TVF shape): for each nation, its top-2 customers
    * by balance via a correlated ORDER BY ... LIMIT — deterministic
    * through the custkey tiebreak. Both engines support the same
    * LATERAL syntax; picked values are single rows, no accumulation.
    */
  val qLateral: GateQuery = GateQuery(
    "q_lateral",
    """SELECT n.n_name, t.c_custkey, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      |ORDER BY n.n_name, t.c_custkey""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin)
  }

  /** C47 — GROUP BY ALL / ORDER BY ALL (the analyst-ergonomics SQL
    * both engines adopted): grouping keys inferred as every
    * non-aggregate select item, ordering as the full select list. The
    * SAME text runs on both engines — inference parity IS the test (a
    * column mis-classified as key or aggregate changes the result
    * shape).
    */
  val qGroupOrderAll: GateQuery = GateQuery(
    "q_group_order_all",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE l_linenumber <= 3
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_linenumber <= 3
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin)
  }

  /** C48 — error-safe arithmetic (`try_divide`, `try_cast`): the
    * ingest-hardening family that turns malformed input into NULL
    * instead of a job-killing exception at row 10^12 of a 100 TB
    * scan. Oracle states the exact NULL semantics with portable
    * NULLIF / TRY_CAST equivalents.
    */
  val qTryFuncs: GateQuery = GateQuery(
    "q_try_funcs",
    """SELECT o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) / NULLIF(o_custkey % 3, 0) AS safe_ratio,
      |  TRY_CAST(o_orderstatus AS BIGINT) AS status_num,
      |  TRY_CAST(substring(CAST(o_orderdate AS VARCHAR), 1, 4) AS BIGINT) AS year_num
      |FROM orders
      |ORDER BY o_orderkey
      |LIMIT 500""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT o_orderkey,
        |  try_divide(CAST(o_totalprice AS DOUBLE), o_custkey % 3) AS safe_ratio,
        |  try_cast(o_orderstatus AS BIGINT) AS status_num,
        |  try_cast(substring(CAST(o_orderdate AS STRING), 1, 4) AS BIGINT) AS year_num
        |FROM orders
        |ORDER BY o_orderkey
        |LIMIT 500""".stripMargin)
  }

  /** C53 — higher-order array functions (lambda family): filter,
    * transform, reduce, exists, forall over each document's token
    * array — the codegen'd in-row loop that replaces a UDF for
    * element-wise work (at 100 TB an explode→group for a per-row
    * array reduction is a shuffle of every token; the lambda form is
    * zero-shuffle). Oracle restates each lambda with DuckDB's list_*
    * combinators (exists/forall via filtered length).
    */
  val qHigherOrder: GateQuery = GateQuery(
    "q_higher_order",
    """SELECT doc_id,
      |  len(list_filter(string_split(text, ' '), w -> len(w) > 4)) AS n_long,
      |  CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '), w -> len(w))), (a, b) -> a + b) AS BIGINT) AS chars_sum,
      |  len(list_filter(string_split(text, ' '), w -> w = 'the')) > 0 AS has_the,
      |  len(list_filter(string_split(text, ' '), w -> len(w) > 0)) = len(string_split(text, ' ')) AS all_nonempty,
      |  array_to_string(list_transform(list_slice(string_split(text, ' '), 1, 4), w -> upper(w)), ' ') AS head_upper
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        size(filter(col("ws"), w => length(w) > 4)).as("n_long"),
        aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w)).as("chars_sum"),
        exists(col("ws"), w => w === "the").as("has_the"),
        forall(col("ws"), w => length(w) > 0).as("all_nonempty"),
        concat_ws(" ", transform(slice(col("ws"), 1, 4), w => upper(w))).as("head_upper"))
      .orderBy("doc_id")
  }

  /** C54 — MAP column type: per document a token→count map is BUILT
    * in-row (map_from_entries over the grouped token list), then
    * accessed (element_at), introspected (sorted keys, cardinality) —
    * the dictionary-shaped column every feature store leans on where
    * a struct's fields aren't known ahead of time. Everything leaves
    * the query as scalars, so map-internal ordering (undefined in
    * both engines) never reaches the hash. The Spark side groups
    * in-row via array machinery (sort + distinct + count per key),
    * exercising map_from_entries exactly where a 100 TB plan wants it
    * — zero shuffle, one projection.
    */
  val qMapType: GateQuery = GateQuery(
    "q_map_type",
    """WITH m AS (
      |  SELECT doc_id,
      |    map_from_entries(list_transform(list_distinct(string_split(text, ' ')),
      |      w -> {'k': w, 'v': len(list_filter(string_split(text, ' '), x -> x = w))})) AS tok_counts
      |  FROM documents)
      |SELECT doc_id,
      |  cardinality(tok_counts) AS n_keys,
      |  COALESCE(tok_counts['the'][1], 0) AS n_the,
      |  list_sort(map_keys(tok_counts))[1] AS first_key,
      |  list_sort(map_keys(tok_counts))[-1] AS last_key
      |FROM m
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val ws = split(col("text"), " ")
    val entries = transform(array_distinct(ws),
      w => struct(w.as("k"),
        size(filter(ws, x => x === w)).cast("long").as("v")))
    Tables(s, dir, "documents")
      .select(col("doc_id"), map_from_entries(entries).as("tok_counts"))
      .select(col("doc_id"),
        size(col("tok_counts")).as("n_keys"),
        coalesce(element_at(col("tok_counts"), "the"), lit(0L)).as("n_the"),
        element_at(array_sort(map_keys(col("tok_counts"))), 1).as("first_key"),
        element_at(array_sort(map_keys(col("tok_counts"))), -1).as("last_key"))
      .orderBy("doc_id")
  }

  /** C61 — bitwise AGGREGATES (bit_and / bit_or / bit_xor): the
    * flag-mask rollup family (permission masks, feature-flag unions,
    * parity checks) both engines ship natively — pinned per group so
    * fold semantics over 64-bit lanes can't diverge.
    */
  val qBitAggs: GateQuery = GateQuery(
    "q_bit_aggs",
    """SELECT o_orderpriority,
      |  CAST(bit_and(o_orderkey) AS BIGINT) AS all_mask,
      |  CAST(bit_or(o_orderkey) AS BIGINT) AS any_mask,
      |  CAST(bit_xor(o_orderkey) AS BIGINT) AS parity,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("bit_and(o_orderkey)").cast("long").as("all_mask"),
        expr("bit_or(o_orderkey)").cast("long").as("any_mask"),
        expr("bit_xor(o_orderkey)").cast("long").as("parity"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** C60 — string function family round 2: `split_part` (the ETL
    * field extractor), `levenshtein` (the fuzzy-match primitive both
    * engines ship natively), and `regexp_extract_all` (multi-match
    * extraction) — pinned as VALUES so tokenization and edit-distance
    * semantics can't silently diverge between engines.
    */
  val qStringFuncs2: GateQuery = GateQuery(
    "q_string_funcs2",
    """SELECT p_partkey,
      |  split_part(p_type, ' ', 1) AS t1,
      |  split_part(p_type, ' ', 3) AS t3,
      |  levenshtein(p_name, p_type) AS lev,
      |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words
      |FROM part
      |WHERE p_partkey <= 300
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "part")
      .filter(col("p_partkey") <= 300)
      .select(col("p_partkey"),
        split_part(col("p_type"), lit(" "), lit(1)).as("t1"),
        split_part(col("p_type"), lit(" "), lit(3)).as("t3"),
        levenshtein(col("p_name"), col("p_type")).as("lev"),
        array_join(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)), ",")
          .as("words"))
      .orderBy("p_partkey")
  }

  /** C58 — MAP higher-order functions (transform_values, map_filter,
    * map_entries): the C54 in-row token→count map pushed through the
    * map-HOF family — double every count, drop entries below a floor,
    * explode the survivors back to rows. The oracle replays with a
    * plain relational group-by, so each HOF must agree with its
    * set-semantics meaning (a value transformed on the wrong key or a
    * filter applied to keys instead of values breaks the hash).
    */
  val qMapHof: GateQuery = GateQuery(
    "q_map_hof",
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |           FROM documents WHERE doc_id % 10 = 0),
      |c AS (SELECT doc_id, w, COUNT(*) AS n FROM w GROUP BY 1, 2)
      |SELECT doc_id, w AS token, CAST(n * 2 AS BIGINT) AS n2
      |FROM c WHERE n * 2 >= 6
      |ORDER BY doc_id, token""".stripMargin) { (s, dir) =>
    val ws = split(col("text"), " ")
    val entries = transform(array_distinct(ws),
      w => struct(w.as("k"),
        size(filter(ws, x => x === w)).cast("long").as("v")))
    Tables(s, dir, "documents").filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), map_from_entries(entries).as("m"))
      .select(col("doc_id"), explode(expr(
        "map_filter(transform_values(m, (k, v) -> v * 2), (k, v) -> v >= 6)")))
      .select(col("doc_id"), col("key").as("token"), col("value").as("n2"))
      .orderBy("doc_id", "token")
  }

  /** C59 — SQL scalar UDF (`CREATE TEMPORARY FUNCTION … RETURN expr`,
    * the Spark 3.4+ SQL-function surface): a quality-bucket macro
    * defined in SQL and applied in a query — the analyst-extension
    * path that needs no JVM code. The oracle inlines the same
    * expression (DuckDB's single-statement contract can't CREATE),
    * which is exactly the semantics the surface promises: a SQL UDF
    * is macro expansion, not a foreign function.
    */
  val qSqlUdf: GateQuery = GateQuery(
    "q_sql_udf",
    """SELECT CASE WHEN n_chars < 200 THEN 'short'
      |            WHEN n_chars < 400 THEN 'medium'
      |            ELSE 'long' END AS bucket,
      |  COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM documents
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents").createOrReplaceTempView("graft_docs_udf")
    // create-if-absent, not OR REPLACE: the definition is a fixed
    // literal, and a REPLACE on every bench rep logs a
    // SimpleFunctionRegistry "replaced a previously registered
    // function" WARN into the tail for no behavior change
    if (!s.catalog.functionExists("graft_len_bucket"))
      s.sql("""CREATE TEMPORARY FUNCTION graft_len_bucket(n BIGINT)
              |RETURNS STRING
              |RETURN CASE WHEN n < 200 THEN 'short'
              |            WHEN n < 400 THEN 'medium'
              |            ELSE 'long' END""".stripMargin)
    s.sql("""SELECT graft_len_bucket(n_chars) AS bucket, COUNT(*) AS n,
            |  SUM(n_chars) AS chars
            |FROM graft_docs_udf
            |GROUP BY 1
            |ORDER BY bucket""".stripMargin)
  }

  /** C55 — schema-drift UNION (unionByName + allowMissingColumns):
    * two vintages of a feed — one carrying `lang`, the other
    * `n_chars` — union BY NAME with null fill for each side's missing
    * column, the in-plan sibling of the C46 storage-level
    * schema-evolution read (there the files differ; here the
    * DataFrames do). Positional UNION would silently misalign or
    * reject; by-name + null-fill is the ingest-hardening contract.
    */
  val qUnionByName: GateQuery = GateQuery(
    "q_union_by_name",
    """SELECT doc_id, 'v1' AS src, lang, CAST(NULL AS BIGINT) AS n_chars
      |FROM documents WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT doc_id, 'v2', CAST(NULL AS VARCHAR), n_chars
      |FROM documents WHERE doc_id % 2 = 1
      |ORDER BY doc_id, src""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val v1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), lit("v1").as("src"), col("lang"))
    val v2 = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), lit("v2").as("src"), col("n_chars").cast("long").as("n_chars"))
    v1.unionByName(v2, allowMissingColumns = true)
      .select("doc_id", "src", "lang", "n_chars")
      .orderBy("doc_id", "src")
  }

  /** C56 — calendar INTERVAL arithmetic (the retention/billing/
    * SLA-window family C29's extract/trunc/diff gates don't touch):
    * day and month interval shifts with month-END CLAMPING pinned
    * cross-engine (Jan 31 + 1 month = the last day of February in
    * both engines — a naive days-based shift gets this wrong),
    * quarter truncation, and date CONSTRUCTION via make_date.
    */
  val qIntervalArith: GateQuery = GateQuery(
    "q_interval_arith",
    """SELECT o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS plus_45d,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
      |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 2 MONTH AS DATE) AS minus_2mo,
      |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
      |  make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_first
      |FROM orders
      |WHERE o_orderkey <= 20000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") <= 20000)
      .select(col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 45).as("plus_45d"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus_3mo"),
        add_months(col("o_orderdate").cast("date"), -2).as("minus_2mo"),
        date_trunc("quarter", col("o_orderdate")).cast("date").as("qtr_start"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .as("month_first"))
      .orderBy("o_orderkey")
  }

  /** C57 — explicit NULL-ordering semantics (NULLS FIRST / NULLS
    * LAST): the engines' DEFAULTS disagree (Spark sorts nulls first
    * ascending, DuckDB last), so any ordered output with nullable
    * keys silently diverges unless the placement is explicit. The
    * driver compare sorts rows, so ordering is pinned AS A VALUE:
    * per-source ROW_NUMBERs under both explicit placements (window
    * partitioned by source — never corpus-wide). Identical SQL text
    * runs on both engines.
    */
  val qNullOrdering: GateQuery = {
    val sql =
      """SELECT doc_id, NULLIF(lang, 'en') AS l,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY NULLIF(lang, 'en') ASC NULLS FIRST, doc_id) AS rk_nf,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY NULLIF(lang, 'en') DESC NULLS LAST, doc_id) AS rk_nl
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    GateQuery("q_null_ordering", sql) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(sql)
    }
  }

  val all: Seq[GateQuery] = Seq(
    qIntersect, qExcept, qExceptAll, qGroupingSets, qWindowFuncs, qStringFuncs,
    qDateFuncs, qCondAgg, qListAgg, qThetaJoin, qExistsCorr, qNullSemantics,
    qRankFuncs, qArrayFuncs, qJsonStruct, qWindowRange, qIgnoreNulls,
    qCsvRoundtrip, qJsonlRoundtrip, qOrcRoundtrip, qZstdRoundtrip, qTextRoundtrip, qSchemaEvolution, qRecursiveCte, qVariant, qPipeSql,
    qLateral, qGroupOrderAll, qTryFuncs, qHigherOrder, qMapType, qMapHof, qSqlUdf, qStringFuncs2, qBitAggs, qUnionByName, qIntervalArith, qNullOrdering)
}
