package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd signed random projection (D33): p_j = Σ_i sign(j,i)·q_i
  * over an int8-quantized embedding, all `outDim` sums in ONE fused
  * unboxed loop. The declarative spelling — one
  * `aggregate(zip_with(...))` per output dim — is a higher-order
  * LambdaFunction per dim, which Catalyst cannot codegen: 16
  * interpreted folds allocating a zipped array each means ~30× the
  * work of this loop (measured 8.9s → the whole-corpus pass must stay
  * inside whole-stage codegen, same rule as NearestCell/DotProduct).
  *
  * The ±1 matrix rides in the expression (outDim·dim longs,
  * driver-sized, j-major flat) exactly like NearestCell's centroids:
  * plan-shipping it keeps the expression self-contained and the
  * projection a zero-shuffle map. Ragged input fails LOUDLY — a
  * silently prefix-projected wrong-dimension vector would be an
  * invisible wrong answer.
  */
case class SignedProject(child: Expression, signs: Array[Long], dim: Int)
    extends UnaryExpression {

  require(dim > 0 && signs.length % dim == 0,
    s"sign matrix length ${signs.length} not a multiple of dim $dim")
  private val outDim: Int = signs.length / dim

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "signed_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"signed_project requires array<bigint>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData]
    if (q.numElements() != dim) throw new IllegalArgumentException(
      s"signed_project: vector dim ${q.numElements()} != $dim")
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      val base = j * dim
      var s = 0L
      var i = 0
      while (i < dim) { s += signs(base + i) * q.getLong(i); i += 1 }
      out(j) = s
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sg = ctx.addReferenceObj("signs", signs, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("spOut")
      val j = ctx.freshName("spJ")
      val i = ctx.freshName("spI")
      val s = ctx.freshName("spS")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "signed_project: vector dim " + $v.numElements() + " != " + $dim);
         |}
         |long[] $out = new long[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $sg[$j * $dim + $i] * $v.getLong($i);
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignedProject =
    copy(child = newChild)
}

object SignedProject {
  /** Column wrapper: all outDim signed-projection sums of `q` against
    * the j-major flattened ±1 matrix.
    */
  def signedProject(q: Column, signs: Array[Array[Long]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    require(signs.nonEmpty, "empty sign matrix")
    GraftColumnBridge.column(SignedProject(
      GraftColumnBridge.expression(q), signs.flatten, signs(0).length))
  }
}
