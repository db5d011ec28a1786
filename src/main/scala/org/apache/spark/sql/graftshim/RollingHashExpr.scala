package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of the first `maxLen` code points, mod
  * 1e9+7, as one native expression. The HOF reference
  * (aggregate(sequence, substring, ascii)) evaluates its CHILD string
  * expression once per step in interpreted mode — with a regexp
  * normalizer as the child that is maxLen full-text regexp passes per
  * row (measured: 2.25 s of q_dedup_simhash's 3.3 s at sf0.1) — and
  * each substring(c, i, 1) scan is O(i) in UTF8String. This evaluates
  * the child once and folds code points in a single JVM loop.
  *
  * Semantics identical to graft.ops.Ops.rollingHashHof (spec-pinned):
  * step i folds codePointAt(i) — what ascii(substring(c, i, 1))
  * yields — and the empty string is 0.
  */
case class RollingHash64(child: Expression, maxLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(maxLen >= 1, "maxLen must be >= 1")
  private val P = 1000000007L

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  def compute(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    var taken = 0
    var i = 0
    while (taken < maxLen && i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
      taken += 1
    }
    acc
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("roller", this, classOf[RollingHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  /** SQL-function constructor: `graft_rolling_hash(s[, maxLen])` — the
    * second argument must be a foldable integral (it sizes the per-row
    * loop at plan time, like graft_heavy_hitters' k).
    */
  def fromFunctionArgs(es: Seq[Expression]): RollingHash64 = {
    if (es.isEmpty || es.size > 2) throw new IllegalArgumentException(
      s"graft_rolling_hash expects (s[, maxLen]), got ${es.size} arguments")
    val maxLen: Int =
      if (es.size == 1) 64
      else es(1) match {
        case e if e.foldable && e.dataType.isInstanceOf[IntegralType] =>
          e.eval() match {
            case null => throw new IllegalArgumentException(
              "graft_rolling_hash maxLen must not be NULL")
            case b: Byte => b.toInt
            case s: Short => s.toInt
            case i: Int => i
            case l: Long =>
              if (l < 1 || l > Int.MaxValue) throw new IllegalArgumentException(
                s"graft_rolling_hash maxLen out of range: $l")
              l.toInt
            case other => throw new IllegalArgumentException(
              s"graft_rolling_hash maxLen has unsupported value: $other")
          }
        case _ => throw new IllegalArgumentException(
          "graft_rolling_hash maxLen must be a foldable integral literal")
      }
    RollingHash64(es.head, maxLen)
  }
}
