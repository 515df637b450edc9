package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd k-means assignment over INTEGER-quantized vectors: index
  * of the centroid with the smallest integer squared distance to the
  * row vector, ties resolving to the lowest index. The exact-arithmetic
  * sibling of [[NearestCell]] (which quantizes doubles for IVF cell
  * routing): distances are BIGINT sums of squares, so the result is the
  * bit-exact argmin an SQL oracle replays with `ROW_NUMBER() OVER
  * (ORDER BY dist, cl)`.
  *
  * This exists because composing the distance from
  * `aggregate(zip_with(...))` per centroid and taking
  * `array_position(array(d...), array_min(array(d...)))` builds the
  * k·dim expression tree TWICE — survivable at k=4 under codegen
  * subexpression elimination, but past the method-size limit at
  * mixture-balancing scale (k=256+, dim=1024) the projection falls
  * back to interpreted eval and boxes every vector. Here the whole
  * argmin is ONE loop over a plan-shipped flat long[], inside
  * whole-stage codegen at any k.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {

  private val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  private val flat: Array[Long] = {
    val out = new Array[Long](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      require(centroids(c).length == dim, "ragged centroid table")
      System.arraycopy(centroids(c), 0, out, c * dim, dim)
      c += 1
    }
    out
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (centroids.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("nearest_centroid requires at least one centroid")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<bigint>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fail LOUDLY on ragged input: a silent prefix-distance would be an
    // invisible wrong assignment (same contract as NearestCell)
    if (n != dim) throw new IllegalArgumentException(
      s"nearest_centroid: vector dim $n != centroid dim $dim")
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c * dim < flat.length) {
      val base = c * dim
      var d = 0L
      var j = 0
      while (j < dim) {
        val t = x.getLong(j) - flat(base + j)
        d += t * t
        j += 1
      }
      // strict < keeps the FIRST minimum: ties -> lowest cluster index
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("ntN")
      val best = ctx.freshName("ntBest")
      val bestD = ctx.freshName("ntBestD")
      val c = ctx.freshName("ntC")
      val d = ctx.freshName("ntD")
      val j = ctx.freshName("ntJ")
      val t = ctx.freshName("ntT")
      s"""
         |int $n = $v.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroid: vector dim " + $n + " != centroid dim " + $dim);
         |}
         |int $best = 0;
         |long $bestD = Long.MAX_VALUE;
         |for (int $c = 0; $c * $dim < $cents.length; $c++) {
         |  long $d = 0L;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    long $t = $v.getLong($j) - $cents[$c * $dim + $j];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column wrapper: argmin-by-integer-L2 cluster index of `vec`. */
  def nearestCentroid(vec: Column, centroids: Array[Array[Long]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NearestCentroid(GraftColumnBridge.expression(vec), centroids))
  }
}
