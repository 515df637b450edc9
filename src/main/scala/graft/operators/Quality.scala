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
}
