package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D66 — declarative data-quality constraint suite (the Deequ shape:
  * a pipeline STATES its invariants — completeness, ranges, key
  * uniqueness, referential integrity — and gets one auditable
  * pass/fail row per constraint). Training pipelines run this before
  * and after every ingest/merge epoch; a silent schema or scraper
  * regression shows up here first, not in loss curves.
  *
  * Scale shape: ALL row-level rules evaluate in ONE full scan — a
  * single global aggregate of conditional sums (map-side partial,
  * fixed-width output, no shuffle of data rows). A uniqueness rule is
  * one key-grouped aggregate (the inherent shuffle); a foreign-key
  * rule is one LEFT ANTI join against the DISTINCT referenced keys
  * (broadcast when the dimension is small). Nothing row-sized ever
  * reaches the driver — each rule reduces to one (name, violations)
  * row.
  *
  * Null semantics are explicit per helper (SQL CHECK-style): range /
  * set / FK rules pass NULLs — nullability is `notNull`'s job — so
  * each rule measures exactly one invariant.
  */
object Quality {

  final case class RowRule(name: String, violated: Column)

  /** NULL violates. */
  def notNull(c: String): RowRule = RowRule(s"not_null_$c", col(c).isNull)

  /** Non-null value outside [lo, hi] violates; NULL passes. */
  def inRange(c: String, lo: Column, hi: Column): RowRule =
    RowRule(s"range_$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** Non-null value outside the set violates; NULL passes. */
  def inSet(c: String, values: Seq[String]): RowRule =
    RowRule(s"set_$c", col(c).isNotNull && !col(c).isin(values: _*))

  /** All row-level rules in ONE aggregate pass, long-form result. */
  def rowChecks(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val aggs = count(lit(1)).as("n_rows") +: rules.zipWithIndex.map {
      case (r, i) =>
        sum(when(coalesce(r.violated, lit(false)), 1L).otherwise(0L)).as(s"__v_$i")
    }
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', __v_$i" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${rules.size}, $stackArgs) AS (constraint_name, violations)"),
        col("n_rows"))
  }

  /** Rows belonging to duplicated key groups count as violations. */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[String]): DataFrame = {
    val dups = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1L)
      .agg(coalesce(sum("__c"), lit(0L)).as("violations"))
    df.agg(count(lit(1)).as("n_rows")).crossJoin(broadcast(dups))
      .select(lit(name).as("constraint_name"), col("violations"), col("n_rows"))
  }

  /** Non-null keys absent from the referenced column violate. */
  def fkCheck(df: DataFrame, name: String, keyCol: String,
      ref: DataFrame, refCol: String): DataFrame = {
    val orphanCount = df.filter(col(keyCol).isNotNull)
      .join(ref.select(col(refCol).as(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
    df.agg(count(lit(1)).as("n_rows")).crossJoin(broadcast(orphanCount))
      .select(lit(name).as("constraint_name"), col("violations"), col("n_rows"))
  }

  /** The full suite: one row per constraint, `passed` derived. */
  /** D78 — MAD-based robust outlier audit: per group, the DISCRETE
    * median of the value (exact cents), the median absolute deviation
    * around it, and the count of rows beyond k·MAD — the
    * heavy-tail-safe outlier gate (mean/σ z-scores break when the
    * tail IS the signal; median/MAD have a 50% breakdown point,
    * Hampel 1974). percentile_disc picks an ACTUAL data value (first
    * value at cume_dist ≥ p), so with integer cents every reported
    * number and the k·MAD compare are engine-exact — no
    * interpolation to disagree on.
    *
    * Scale shape: two grouped ordered-set aggregates (the inherent
    * per-group sorts) + one broadcast-sized join of the per-group
    * medians back; the outlier count is a conditional sum in the
    * same pass as the MAD join. Fixed-width rows only.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 5): DataFrame = {
    val y = df.select(col(groupCol),
      (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast("long").as("yc"))
    val med = y.groupBy(groupCol).agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY yc) AS BIGINT)")
        .as("med_cents"))
    val dev = y.join(broadcast(med), groupCol)
      .withColumn("ad", abs(col("yc") - col("med_cents")))
    val mad = dev.groupBy(groupCol).agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS BIGINT)")
        .as("mad_cents"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        max("med_cents").as("med_cents"), max("mad_cents").as("mad_cents"),
        sum(when(col("ad") > lit(k.toLong) * col("mad_cents"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  def check(df: DataFrame, rules: Seq[RowRule],
      uniqueKeys: Seq[(String, Seq[String])] = Nil,
      foreignKeys: Seq[(String, String, DataFrame, String)] = Nil): DataFrame = {
    val parts =
      (if (rules.nonEmpty) Seq(rowChecks(df, rules)
        .select("constraint_name", "violations", "n_rows")) else Nil) ++
      uniqueKeys.map { case (n, ks) => uniqueCheck(df, n, ks) } ++
      foreignKeys.map { case (n, k, ref, rk) => fkCheck(df, n, k, ref, rk) }
    require(parts.nonEmpty, "no constraints")
    parts.reduce(_.unionByName(_))
      .select(col("constraint_name"), col("n_rows"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** D91 — one-row-per-column dataset profile (the Deequ/TFDV
    * column-statistics pass run BEFORE constraints are even written:
    * you state `lang IN (...)` because a profile told you the
    * alphabet): per column the row count, null count, exact distinct
    * count, and min/max (typed comparison, rendered as strings after
    * the aggregate so numeric columns keep numeric order).
    *
    * Scale shape: null counts and min/max for EVERY column come from
    * ONE scan (conditional aggregates, map-side partial, single-row
    * result — the q_constraints discipline); exact multi-column
    * distinct counts need per-value reduction, so a second pass melts
    * to (column, value) pairs — k·n fixed-width rows through one
    * partial-agg exchange, the only shape exact distinct admits
    * (estimates belong to D57's HLL sketches). Nothing wider than a
    * value string ever shuffles.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))): _*)).as("s"))
      .select("s.*")
    val distincts = df.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select("s.*")
      .filter(col("v").isNotNull)
      .groupBy("col_name")
      .agg(count_distinct(col("v")).as("n_distinct"))
    perCol.join(distincts, Seq("col_name"), "left")
      .na.fill(0L, Seq("n_distinct"))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
  }
}
