package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a token array, as one native expression
  * instead of the (array_distinct)(transform(sequence, slice,
  * array_join)) HOF stack — the HOF formulation allocates an
  * intermediate array per lambda step and interprets every element; this
  * is a single pass building UTF8Strings.
  *
  * Semantics are identical to the HOF version (graft.ops.Ops.shingles /
  * shinglesAll): shingle i = tokens[i, min(i+n, len)) joined by a single
  * space, i ∈ [0, max(len−n, 0)]; with `keepDuplicates = false` (the
  * MinHash/Jaccard set form) deduplicated keeping first occurrence,
  * with `true` every occurrence in position order — element i IS the
  * shingle starting at token i, the property the span operators'
  * posexplode relies on.
  */
case class WordShingles(child: Expression, n: Int,
                        keepDuplicates: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  private val space = UTF8String.fromString(" ")

  def compute(toksRaw: ArrayData): ArrayData = {
    val len = toksRaw.numElements()
    val numShingles = math.max(len - n, 0) + 1
    val seen: java.util.LinkedHashSet[UTF8String] =
      if (keepDuplicates) null
      else new java.util.LinkedHashSet[UTF8String](numShingles * 2)
    val all: Array[Any] = if (keepDuplicates) new Array[Any](numShingles)
                          else null
    var i = 0
    while (i < numShingles) {
      val end = math.min(i + n, len)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        val t = toksRaw.getUTF8String(j)
        parts(j - i) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      val sh = UTF8String.concatWs(space, parts: _*)
      if (keepDuplicates) all(i) = sh else seen.add(sh)
      i += 1
    }
    if (keepDuplicates) return new GenericArrayData(all)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
