package graft.heap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B25 — growth census between two dumps of the same process: the
  * "what grew" question every leak investigation starts from (take a
  * dump, wait, take another, diff the histograms — the jmap-histo-diff
  * workflow, here over the exported parquet so it runs distributed and
  * joins into the rest of the analysis suite). Reference anchor:
  * single-dump analysis only (scripts/analyze_heap_parquet.py) — the
  * reference has no diff; this is the natural two-session extension of
  * its session registry.
  *
  * Scale shape: each side reduces to its type-level census (one join +
  * one aggregate, type-count-sized output) BEFORE the full-outer
  * diff join — two dumps never meet at object granularity.
  */
object HeapDiff {

  /** Per-type object-count and shallow-byte deltas, `after − before`.
    * Types absent from one side report zero there (births and deaths
    * both surface). One row per type seen in either dump.
    */
  def typeDelta(before: HeapTables, after: HeapTables): Option[DataFrame] = for {
    a <- new HeapAnalysis(before).typeSizeCensus
    b <- new HeapAnalysis(after).typeSizeCensus
  } yield {
    val an = a.select(col("type_name"), col("n_objects").as("n_before"),
      col("shallow_bytes").as("bytes_before"))
    val bn = b.select(col("type_name"), col("n_objects").as("n_after"),
      col("shallow_bytes").as("bytes_after"))
    an.join(bn, Seq("type_name"), "full_outer")
      .select(col("type_name"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        (coalesce(col("n_after"), lit(0L)) - coalesce(col("n_before"), lit(0L)))
          .as("delta_n"),
        coalesce(col("bytes_before"), lit(0L)).as("bytes_before"),
        coalesce(col("bytes_after"), lit(0L)).as("bytes_after"),
        (coalesce(col("bytes_after"), lit(0L)) - coalesce(col("bytes_before"), lit(0L)))
          .as("delta_bytes"))
  }

  /** B29 — RETAINED-size growth diff, the leak answer typeDelta's
    * shallow census can only approximate: per root type, how much the
    * memory its roots HOLD ALIVE grew between the dumps (a Cache type
    * whose own rows are 24 bytes each but whose retained subtrees
    * doubled is the leak; shallow deltas rank it far down). Each side
    * runs the B22 dominator-approximate derivation to its type-level
    * retained census, then a full-outer diff — the two object graphs
    * never meet. Same approximation contract as B22, applied equally
    * to both sides, so the DELTA of under-collapse cancels for
    * structurally-similar dumps.
    */
  def retainedDelta(before: HeapTables, after: HeapTables): Option[DataFrame] = for {
    a <- new HeapAnalysis(before).retainedSize()
    b <- new HeapAnalysis(after).retainedSize()
  } yield {
    val an = a.select(col("type_name"), col("n_roots").as("roots_before"),
      col("retained_bytes").as("retained_before"))
    val bn = b.select(col("type_name"), col("n_roots").as("roots_after"),
      col("retained_bytes").as("retained_after"))
    an.join(bn, Seq("type_name"), "full_outer")
      .select(col("type_name"),
        coalesce(col("roots_before"), lit(0L)).as("roots_before"),
        coalesce(col("roots_after"), lit(0L)).as("roots_after"),
        coalesce(col("retained_before"), lit(0L)).as("retained_before"),
        coalesce(col("retained_after"), lit(0L)).as("retained_after"),
        (coalesce(col("retained_after"), lit(0L)) -
          coalesce(col("retained_before"), lit(0L))).as("delta_retained"))
  }
}
