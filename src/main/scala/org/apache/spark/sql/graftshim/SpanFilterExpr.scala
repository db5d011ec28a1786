package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Drop every token covered by a duplicate span: token at 1-based
  * position p survives iff NO start s in `starts` satisfies
  * s <= p <= s + n - 1. `starts` must be sorted ascending (the operator
  * feeds it from sort_array(collect_set(...))).
  *
  * One two-pointer pass — O(tokens + starts) per document — replacing
  * the formulation that exploded every span into n removed positions
  * (an n-fold shuffle fan-out) and then ran an interpreted
  * array_contains per token (O(tokens × removed) per document; ~10¹⁰
  * comparisons for a fully-duplicated MaxToks document). Semantics are
  * pinned equal to that reference formulation by spec and property.
  */
case class DropCoveredSpans(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(n >= 1, "span length must be >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_drop_covered_spans"

  def compute(toks: ArrayData, starts: ArrayData): ArrayData = {
    val len = toks.numElements()
    val m = starts.numElements()
    val out = new Array[Any](len)
    var k = 0       // kept count
    var j = 0       // next unconsumed start
    var covered = 0L // highest position covered so far
    var p = 1L
    while (p <= len) {
      while (j < m && starts.getLong(j) <= p) {
        val end = starts.getLong(j) + (n - 1)
        if (end > covered) covered = end
        j += 1
      }
      if (p > covered) {
        out(k) = if (toks.isNullAt((p - 1).toInt)) null
                 else toks.getUTF8String((p - 1).toInt)
        k += 1
      }
      p += 1
    }
    val kept = new Array[Any](k)
    System.arraycopy(out, 0, kept, 0, k)
    new GenericArrayData(kept)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanFilter", this,
                                  classOf[DropCoveredSpans].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropCoveredSpans =
    copy(left = newLeft, right = newRight)
}
