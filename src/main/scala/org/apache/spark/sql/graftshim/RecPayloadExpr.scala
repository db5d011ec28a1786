package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The recommender's "id@score,id@score,…" payload body, built in one
  * compiled pass per user instead of an interpreted
  * array_join(transform(concat, format_string)) HOF stack — with
  * K = 100 items per user the HOF form evaluates hundreds of
  * interpreted expression nodes and one java.util.Formatter parse per
  * item, which full-plan timing showed dominating the flagship query.
  *
  * Semantics are bit-identical to the HOF form: score =
  * 1 − (s − mn)/(mx − mn) in plain IEEE double order (1.0 when
  * mx == mn), formatted with the same Locale.US "%.4f" semantics
  * (shortest-repr digits rounded HALF_UP — what both Spark's
  * format_string and a C printf produce on these values, pinned by the
  * cross-engine hash gate).
  */
case class RecPayload(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    ArrayType(new StructType()
      .add("score", DoubleType).add("id", LongType)),
    DoubleType, DoubleType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_rec_payload"

  // %.4f on values in [0, 1]: shortest-decimal digits of the double,
  // rounded HALF_UP to 4 places — BigDecimal.valueOf goes through
  // Double.toString (shortest repr), matching java.util.Formatter's
  // digit source, without Formatter's per-call format-string parse.
  private def fmt4(v: Double): String =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).toPlainString

  def compute(topRaw: ArrayData, mn: Double, mx: Double): UTF8String = {
    val n = topRaw.numElements()
    val sb = new java.lang.StringBuilder(n * 12)
    var i = 0
    while (i < n) {
      val row = topRaw.getStruct(i, 2)
      val s = row.getDouble(0)
      val id = row.getLong(1)
      val score = if (mx == mn) 1.0 else 1.0 - (s - mn) / (mx - mn)
      if (i > 0) sb.append(',')
      sb.append(id).append('@').append(fmt4(score))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(top: Any, mn: Any, mx: Any): Any =
    compute(top.asInstanceOf[ArrayData],
            mn.asInstanceOf[Double], mx.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("payloader", this, classOf[RecPayload].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b, c) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): RecPayload =
    copy(first = newFirst, second = newSecond, third = newThird)
}
