package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Centered Gram (second-moment) matrix of a float-vector column as ONE
  * mergeable aggregate: per row, every (i, j) product of the mean-
  * centered vector is snapped to 1e-6 micro-units and accumulated into a
  * long[dim²] buffer — a tight primitive loop instead of the d²-struct
  * explode→shuffle formulation (whose interpreted HOF allocation
  * dominated q_embed_pca's wall at 10×: 82M struct allocations for 20k
  * vectors). Partial state is dim²·8 bytes per partition (32 KiB at
  * dim 64) merged element-wise, so a 1000-executor Gram build ships one
  * fixed-size buffer per partition — the classic O(d²)-state / O(N·d²)-
  * work distributed PCA shape.
  *
  * Exactness: identical per-term snapping (half-away-from-zero, the SQL
  * round rule) and exact BIGINT sums make the result bit-equal to the
  * explode formulation and the DuckDB oracle, at any parallelism or
  * partition order.
  *
  * `mean` rides the plan as a literal parameter object (the planes-
  * matrix pattern, VectorExprs.scala) — broadcast once with the plan,
  * never re-read per row.
  */
case class GramMatrixAgg(
    vecExpr: Expression,
    mean: Array[Double],
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(vecExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_matrix"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim * dim)

  // SQL round(): half away from zero — Scala math.round is half toward
  // +inf and diverges on negative .5 boundaries.
  @inline private def snap(x: Double): Long =
    (math.signum(x) * math.floor(math.abs(x) + 0.5)).toLong

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vecExpr.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      val c = new Array[Double](dim)
      var i = 0
      while (i < n) { c(i) = arr.getFloat(i).toDouble - mean(i); i += 1 }
      while (i < dim) { c(i) = -mean(i); i += 1 } // short vector: pad 0.0f
      i = 0
      while (i < dim) {
        val ci = c(i)
        val row = i * dim
        var j = 0
        while (j < dim) {
          buf(row + j) += snap(ci * c(j) * 1e6)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): GramMatrixAgg =
    copy(vecExpr = cs(0))
}
