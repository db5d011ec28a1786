package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over pre-hashed gram values, as ONE native
  * expression instead of the transform(sequence, k -> array_min(
  * transform(xs, affine))) HOF stack: the HOF formulation interprets
  * nHashes × |grams| lambda evaluations per document (the dominant cost
  * of the MinHash pipeline at any scale), while this is a single
  * compiled pass — grams outer, hash family inner, running minima in a
  * local array.
  *
  * Semantics are identical to the HOF reference
  * (graft.ops.Ops.minHashSignatureModHof, spec-pinned): slot k holds
  * min over grams x of ((2k+1)·x + (1000003·k + 12345)) mod P with
  * P = 1_000_000_007; an empty gram array yields nHashes nulls (what
  * array_min returns over an empty transform).
  */
case class MinHashSig(child: Expression, nHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nHashes >= 1, "signature needs at least one hash slot")

  private val P = 1000000007L

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](nHashes))
    val mins = new Array[Long](nHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var k = 0
      while (k < nHashes) {
        val v = ((2L * k + 1L) * x + (1000003L * k + 12345L)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    val out = new Array[Any](nHashes)
    var k = 0
    while (k < nHashes) { out(k) = mins(k); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhasher", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
