package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd BIGINT squared euclidean distance from an integer-
  * quantized vector column to ONE plan-shipped center — the
  * [[NearestCentroid]] loop without the argmin, for operators that
  * need the DISTANCE itself (k-center farthest-point selection's
  * running min). A single fused loop over a flat long[]: stays inside
  * whole-stage codegen at any dim, no per-element lambda boxing (the
  * `aggregate(zip_with(...))` spelling is an interpreted fold).
  */
case class SqDistToCenter(child: Expression, center: Array[Long])
    extends UnaryExpression {

  private val dim: Int = center.length

  override def dataType: DataType = LongType
  override def prettyName: String = "sq_dist_to_center"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (dim > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("sq_dist_to_center requires a non-empty center")
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_dist_to_center requires array<bigint>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"sq_dist_to_center: vector dim $n != center dim $dim")
    var d = 0L
    var j = 0
    while (j < dim) {
      val t = x.getLong(j) - center(j)
      d += t * t
      j += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("center", center, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("sdN")
      val d = ctx.freshName("sdD")
      val j = ctx.freshName("sdJ")
      val t = ctx.freshName("sdT")
      s"""
         |int $n = $v.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "sq_dist_to_center: vector dim " + $n + " != center dim " + $dim);
         |}
         |long $d = 0L;
         |for (int $j = 0; $j < $dim; $j++) {
         |  long $t = $v.getLong($j) - $c[$j];
         |  $d += $t * $t;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SqDistToCenter =
    copy(child = newChild)
}

object SqDistToCenter {
  /** Column wrapper: BIGINT squared distance of `vec` to `center`. */
  def sqDistToCenter(vec: Column, center: Array[Long]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SqDistToCenter(GraftColumnBridge.expression(vec), center))
  }
}
