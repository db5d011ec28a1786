package org.apache.spark.sql.graftshim

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-K state: the K smallest (score, id) pairs seen, ordered
  * lexicographically (score asc, id asc — the engine's deterministic
  * tiebreak, SURVEY §7.4.4). Backed by a max-heap so insertion beyond K
  * is O(log K) and the shuffled state is K entries, never the group.
  */
final class TopKState(val k: Int) {
  // max-heap on (score, id): head = current worst of the kept K
  val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
               .lt((score, id), heap.head)) {
      heap.dequeue()
      heap.enqueue((score, id))
    }
  }

  def mergeFrom(other: TopKState): Unit =
    other.heap.foreach { case (s, i) => insert(s, i) }

  def sortedAsc: Array[(Double, Long)] = heap.toArray.sorted
}

/** Per-group bounded top-K as a TypedImperativeAggregate — the true
  * MapReduce-combiner equivalent of the reference's bounded reducer emit
  * (UserHotcar.java:176-193): partial aggregation keeps only K rows per
  * group per partition, so the shuffle moves O(groups × K) instead of
  * every row. This is the scale path for top-K over skewed groups, where
  * the window formulation (`row_number` over a full sort) must shuffle
  * and sort the entire input.
  *
  * Returns array<struct<score double, id bigint>> sorted (score asc,
  * id asc), length ≤ k.
  */
case class BoundedTopK(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  // implicit casts (int score -> double, int id -> bigint) keep this
  // generic helper accepting the same inputs the window formulation does,
  // instead of ClassCastException-ing at executor runtime
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType), containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKState): Any = {
    val rows: Array[Any] = buf.sortedAsc.map { case (s, i) =>
      InternalRow(s, i): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val arr = buf.sortedAsc
    out.writeInt(arr.length)
    arr.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new TopKState(k)
    val n = in.readInt()
    var j = 0
    while (j < n) { st.insert(in.readDouble(), in.readLong()); j += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BoundedTopK =
    copy(scoreExpr = cs(0), idExpr = cs(1))
}
