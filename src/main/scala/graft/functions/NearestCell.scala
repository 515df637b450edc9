package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd IVF cell assignment: index of the centroid nearest (by
  * euclidean distance on the unit-normalized vector, == cosine order)
  * to `vec / norm`. This runs once per corpus row when building or
  * probing an IVF layout, so it is the one expression that must stay
  * inside whole-stage codegen — a Scala UDF here boxes every vector
  * into Seq[Double] and dominates the whole job at scale.
  *
  * The centroid table rides in the expression itself (flattened to one
  * double[] reference object): a trained quantizer is
  * nLists×dim doubles — plan-shipping it costs less than one broadcast
  * round and keeps the expression self-contained. Ties resolve to the
  * lowest cell index; a zero norm yields NaN distances and falls back
  * to cell 0 — both match the interpreted trainer's argmin.
  */
case class NearestCell(left: Expression, right: Expression,
    centroids: Array[Array[Double]]) extends BinaryExpression {

  private val dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  private val flat: Array[Double] = {
    val out = new Array[Double](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      System.arraycopy(centroids(c), 0, out, c * dim, dim)
      c += 1
    }
    out
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(DoubleType, _) if right.dataType == DoubleType =>
      if (centroids.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("nearest_cell requires at least one centroid")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires (array<double>, double), got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(v: Any, nrm: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fail LOUDLY on ragged input: silently prefix-bucketing a
    // wrong-dimension vector would be an invisible wrong answer, and
    // the query-side probe (nearestCellsTo) throws on the same input
    if (n != dim) throw new IllegalArgumentException(
      s"nearest_cell: vector dim $n != centroid dim $dim")
    val nr = nrm.asInstanceOf[Double]
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c * dim < flat.length) {
      val base = c * dim
      var d = 0.0
      var j = 0
      while (j < dim) {
        // divide (not multiply by 1/nrm): bit-identical to the
        // interpreted quantizer trainer's argmin
        val t = x.getDouble(j) / nr - flat(base + j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, nrm) => {
      val n = ctx.freshName("ncN")
      val best = ctx.freshName("ncBest")
      val bestD = ctx.freshName("ncBestD")
      val c = ctx.freshName("ncC")
      val d = ctx.freshName("ncD")
      val j = ctx.freshName("ncJ")
      val t = ctx.freshName("ncT")
      s"""
         |int $n = $v.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_cell: vector dim " + $n + " != centroid dim " + $dim);
         |}
         |int $best = 0;
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c * $dim < $cents.length; $c++) {
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    double $t = $v.getDouble($j) / $nrm - $cents[$c * $dim + $j];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}

object NearestCell {
  /** Column wrapper: cell index of the nearest centroid to vec/norm. */
  def nearestCell(vec: Column, norm: Column, centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NearestCell(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(norm), centroids))
  }
}
