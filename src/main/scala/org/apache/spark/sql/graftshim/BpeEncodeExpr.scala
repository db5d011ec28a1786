package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE-encode one word with a learned merge table, as a single native
  * expression instead of the NumMerges-deep nested `replace` chain: one
  * symbol array, one integer pass per merge — no regexp pre-split, no
  * per-merge string allocation of the whole wrapped word.
  *
  * Semantics replicate the `'|'-wrapped string + replace("|l|r|",
  * "|lr|")` encoder (graft.ext.Corpus.bpeEncode, also the DuckDB oracle)
  * EXACTLY — including the consumed-boundary subtlety of sequential
  * non-overlapping replace: a match consumes its trailing '|', so after
  * merging the pair at symbols (i, i+1), the pair (i+2, i+3) can NOT
  * merge in the same pass (its anchor pipe was consumed); the next
  * mergeable pair is (i+3, i+4). "aaaa" under merge (a,a) is therefore
  * [aa, a, a] — NOT [aa, aa] — on both the string path and this one.
  * The spec pins this expression equal to the string fold on adversarial
  * repeat patterns.
  */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  // (left, right, merged) per learned merge, in learned order.
  @transient private lazy val mt: Array[Array[String]] =
    merges.map { case (l, r) => Array(l, r, l + r) }.toArray

  def compute(w: UTF8String): ArrayData = {
    val s = w.toString
    var n = s.length
    val syms = new Array[String](math.max(n, 1))
    var i = 0
    while (i < n) { syms(i) = String.valueOf(s.charAt(i)); i += 1 }
    var m = 0
    while (m < mt.length) {
      val l = mt(m)(0); val r = mt(m)(1); val lr = mt(m)(2)
      var in = 0; var out = 0
      while (in < n) {
        if (in + 1 < n && syms(in) == l && syms(in + 1) == r) {
          // Write positions stay <= read positions, so the in-place
          // compaction never clobbers an unread symbol.
          syms(out) = lr; out += 1
          if (in + 2 < n) { syms(out) = syms(in + 2); out += 1 }
          in += 3
        } else { syms(out) = syms(in); out += 1; in += 1 }
      }
      n = out
      m += 1
    }
    val arr = new Array[Any](n)
    var k = 0
    while (k < n) { arr(k) = UTF8String.fromString(syms(k)); k += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncodeWord].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}
