package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Portable HyperLogLog (m = 64 registers) as a single-pass mergeable
  * sketch aggregate — the production form of the engine's
  * q_approx_distinct: partial sketches are 64 bytes per group per
  * partition, merged register-wise, so a 1000-executor distinct-count is
  * one aggregation with a 64-byte shuffle payload per group (the
  * relational two-groupBy formulation shuffles one row per register).
  *
  * Input is the caller-supplied 60-bit hash (Ops.md5Bits60 — md5 hex is
  * byte-identical across engines, which is what makes this sketch
  * oracle-able at all). The estimate arithmetic mirrors the relational
  * formulation EXACTLY (register = h % 64, rank from the remaining 54
  * bits, register sum as the exact integer Σ 2^(55−M_r), one double
  * division by the folded α·m²·2^55 constant, StrictMath.log small-range
  * correction — the same function Catalyst's `log` uses), pinned equal
  * by spec so either path can serve the query.
  */
final class HllState {
  val regs = new Array[Byte](64)

  def update(h: Long): Unit = {
    // graft_hll is a public SQL function: mask to the expected 60-bit
    // domain so a negative or >=2^60 hash (e.g. xxhash64 output) can't
    // index regs negatively or produce a non-positive rank. A no-op for
    // Ops.md5Bits60 inputs, so oracle parity is unchanged.
    val hm = h & ((1L << 60) - 1)
    val r = (hm % 64).toInt
    val w = hm >>> 6
    val rank = if (w == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rank > regs(r)) regs(r) = rank.toByte
  }

  def mergeFrom(other: HllState): Unit = {
    var i = 0
    while (i < 64) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }

  /** α₆₄·m²·2^55 / Σ 2^(55−M_r), with the standard small-range
    * correction. The sum is exact integer math; the constant is the same
    * folded double literal as the SQL oracle.
    */
  def estimate: Double = {
    var zs = 0L
    var v = 0L
    var i = 0
    while (i < 64) {
      zs += 1L << (55 - regs(i))
      if (regs(i) == 0) v += 1
      i += 1
    }
    val estRaw = 1.0462993238608057e+20 / zs.toDouble
    if (estRaw <= 160.0 && v > 0) 64.0 * StrictMath.log(64.0 / v)
    else estRaw
  }
}

case class HllSketchAgg(
    hashExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllState] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(hashExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): HllState = new HllState

  override def update(buf: HllState, input: InternalRow): HllState = {
    val h = hashExpr.eval(input)
    if (h != null) buf.update(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: HllState, other: HllState): HllState = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: HllState): Any = buf.estimate

  override def serialize(buf: HllState): Array[Byte] = buf.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllState = {
    val st = new HllState
    System.arraycopy(bytes, 0, st.regs, 0, 64)
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllSketchAgg =
    copy(hashExpr = cs(0))
}
