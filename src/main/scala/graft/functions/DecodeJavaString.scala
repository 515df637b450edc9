package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd compact-string decode: java.lang.String backing bytes →
  * text, honoring the JDK-9+ `coder` field (0 = Latin-1, 1 =
  * UTF-16LE — public JVM compact-strings layout; reference reads the
  * same pair, analyze_heap_parquet.py duplicate-strings check). This
  * is the inner loop of the B6 full-corpus duplicate-strings pass
  * over the largest table a real dump has, so it must stay inside
  * whole-stage codegen: the previous Scala UDF boxed every byte[]
  * into Seq[Byte] per row.
  */
case class DecodeJavaString(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "decode_java_string"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"decode_java_string requires (array<tinyint>, int), got $l / $r")
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    DecodeJavaString.decode(v.asInstanceOf[ArrayData].toByteArray(), c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.DecodeJavaString.decode($v.toByteArray(), $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DecodeJavaString {
  /** Shared by interpreted eval and generated code. */
  def decode(bytes: Array[Byte], coder: Int): UTF8String =
    UTF8String.fromString(
      if (coder == 1) new String(bytes, java.nio.charset.StandardCharsets.UTF_16LE)
      else new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1))

  def apply(values: Column, coder: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(DecodeJavaString(
      GraftColumnBridge.expression(values), GraftColumnBridge.expression(coder)))
  }
}
