package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of `[a-zA-Z0-9 ]` characters — one native byte-scan pass.
  *
  * Drop-in for `length(regexp_replace(s, "[^a-zA-Z0-9 ]", ""))`, which
  * BUILDS the replaced string with the Java regex engine just to take
  * its length: profiled at 100×-diverse, that regex was 499 s of
  * q_quality_score's ~515 s executor CPU (docs/SCALE.md round-13
  * split). The matched class is pure ASCII and ASCII bytes never occur
  * inside UTF-8 continuation sequences, so a byte scan counts exactly
  * the characters the regex formulation keeps — integer-identical,
  * hence the downstream double arithmetic (and the DuckDB oracle's
  * `length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))`) is
  * bit-identical.
  */
case class AlnumSpaceCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_alnum_space_count"

  def compute(u: UTF8String): Int = {
    val n = u.numBytes
    var i = 0
    var c = 0
    while (i < n) {
      val b = u.getByte(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9') || b == ' ') c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("counter", this, classOf[AlnumSpaceCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): AlnumSpaceCount =
    copy(child = newChild)
}
