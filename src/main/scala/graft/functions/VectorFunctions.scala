package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md
  * §2.D5–D7, D13). Everything is built from codegen'd higher-order
  * functions; sums fold left-to-right in element order, which makes
  * the doubles bit-reproducible across engines (the DuckDB oracle
  * folds the same way via `list_aggregate(..., 'sum')`).
  */
object VectorFunctions {

  /** Elementwise cast to double — float inputs are widened exactly. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product in double precision: a codegen'd
    * Catalyst expression (DotProduct) — same fold order as
    * `aggregate(zip_with(...))` but stays in whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sign-bit LSH bucket from the first `bits` dimensions — the IVF
    * coarse quantizer for the bucketed ANN path. Cheap, deterministic,
    * and computable at write time for bucketed storage layouts.
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
