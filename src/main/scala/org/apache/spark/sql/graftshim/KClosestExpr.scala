package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** The K items whose `price` is closest to a probe value `b`, over an
  * items array PRE-SORTED by (price asc, id asc) — the classic
  * "K closest elements in a sorted array" search: binary-search the
  * insertion point, then walk two pointers outward. O(log n + K + ties)
  * per row instead of the O(n log K) of feeding every candidate through
  * a heap (or O(n log n) of sorting per row) — at a broadcast-join
  * recommender's scale the per-row candidate list is the whole side
  * table, so this is the difference between touching K items and
  * touching all of them, per user.
  *
  * Output: array<struct<score double, id bigint>> of length
  * min(K, n), holding (|b−price|, id) sorted by (score asc, id asc) —
  * exactly the bounded-top-K contract (ties beyond the Kth distance are
  * resolved by id, deterministically; all arithmetic is plain IEEE
  * double, identical to what a relational re-derivation computes).
  *
  * Null/empty inputs yield null (BinaryExpression default) / an empty
  * array respectively.
  */
case class KClosestItems(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(k >= 1, "k must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(
    ArrayType(new StructType()
      .add("price", DoubleType).add("id", LongType)),
    DoubleType)
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType), containsNull = false)
  override def prettyName: String = "graft_k_closest"

  def compute(itemsRaw: ArrayData, b: Double): ArrayData = {
    val n = itemsRaw.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    def priceAt(i: Int): Double = itemsRaw.getStruct(i, 2).getDouble(0)
    def idAt(i: Int): Long = itemsRaw.getStruct(i, 2).getLong(1)
    // binary search: first index with price > b
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (priceAt(mid) <= b) lo = mid + 1 else hi = mid
    }
    // Pass 1 — kth-smallest distance: walk min(k, n) greedy steps.
    var l = lo - 1; var r = lo
    var taken = 0; var dK = 0.0
    while (taken < k && (l >= 0 || r < n)) {
      val dl = if (l >= 0) math.abs(b - priceAt(l)) else Double.PositiveInfinity
      val dr = if (r < n) math.abs(b - priceAt(r)) else Double.PositiveInfinity
      if (dl <= dr) { dK = math.max(dK, dl); l -= 1 }
      else { dK = math.max(dK, dr); r += 1 }
      taken += 1
    }
    // Pass 2 — gather ALL items with dist <= dK (ties included), then
    // order by (dist, id) and keep k. Tie width is bounded by duplicate
    // prices at distance dK, so the buffer stays ~k.
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = lo - 1
    while (i >= 0 && math.abs(b - priceAt(i)) <= dK) {
      buf += ((math.abs(b - priceAt(i)), idAt(i))); i -= 1
    }
    i = lo
    while (i < n && math.abs(b - priceAt(i)) <= dK) {
      buf += ((math.abs(b - priceAt(i)), idAt(i))); i += 1
    }
    val top = buf.sorted.take(k)
    val out = new Array[Any](top.size)
    var j = 0
    top.foreach { case (s, id) =>
      out(j) = InternalRow(s, id); j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(items: Any, b: Any): Any =
    compute(items.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kclosest", this, classOf[KClosestItems].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KClosestItems =
    copy(left = newLeft, right = newRight)
}
