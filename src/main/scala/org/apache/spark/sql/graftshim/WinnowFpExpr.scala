package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprints of a token array as ONE native pass: hash every
  * k-token gram (md5, first 60 bits — bit-equal to Ops.md5Bits60 on the
  * space-joined gram text + salt), then emit the DISTINCT minima of every
  * w-gram window, in first-occurrence order (order is irrelevant
  * downstream — the set is exploded and grouped).
  *
  * Replaces the transform(sequence, i -> conv(substr(md5(...))))  +
  * transform(sequence, s -> array_min(slice(...))) HOF stack, which
  * interprets an md5+conv lambda per gram and an array_min per window —
  * measured 230 s for the 10× corpus (~23M interpreted md5 evals) vs a
  * compiled digest loop. Semantics identical (the oracle transliterates
  * the same md5-prefix hash in SQL), and the pass stays map-side: the
  * thinned fingerprint set is what shuffles, exactly as before.
  */
case class WinnowFp(child: Expression, k: Int, w: Int, salt: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && w >= 1, "gram size and window size must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fp"

  private val saltBytes = salt.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val ng = n - (k - 1)
    if (ng < 1) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val g = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      md.update(saltBytes)
      val dig = md.digest()
      // first 15 hex chars of the digest == first 60 bits, big-endian:
      // 7 full bytes then the high nibble of byte 7 (what
      // conv(substring(md5(x), 1, 15), 16, 10) parses)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      v = (v << 4) | ((dig(7) >> 4) & 0xfL)
      g(i) = v
      i += 1
    }
    val nw = ng - (w - 1)
    if (nw < 1) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    val mins = new Array[Long](nw)
    var cnt = 0
    var s = 0
    while (s < nw) {
      var m = g(s)
      var j = 1
      while (j < w) { if (g(s + j) < m) m = g(s + j); j += 1 }
      if (seen.add(m)) { mins(cnt) = m; cnt += 1 }
      s += 1
    }
    val out = java.util.Arrays.copyOf(mins, cnt)
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnower", this, classOf[WinnowFp].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}
