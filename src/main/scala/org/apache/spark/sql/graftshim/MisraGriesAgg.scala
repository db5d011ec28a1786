package org.apache.spark.sql.graftshim

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary over string items: at most k
  * counters; an item absent from the counters decrements all of them
  * (conceptually), so any item with true frequency > n/(k+1) is
  * GUARANTEED to survive — the candidate-generation half of the
  * two-pass heavy-hitters pattern. Counter VALUES are order-dependent
  * (as in any MG sketch); only the superset guarantee is relied on, and
  * the engine's q_heavy_hitters re-counts candidates exactly in a
  * second pass, making the final answer deterministic and oracle-able.
  *
  * Merge (for partial aggregation) is the standard summary merge: add
  * counters pointwise, then subtract the (k+1)-largest count from all
  * and drop non-positive — preserving the guarantee across partitions,
  * which is what lets the sketch ship as an O(k) partial state instead
  * of a full-cardinality groupBy.
  */
final class MgState(val k: Int) {
  val counters = scala.collection.mutable.LinkedHashMap.empty[String, Long]
  var n: Long = 0L

  def update(item: String): Unit = {
    n += 1
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None if counters.size < k => counters.update(item, 1L)
      case None =>
        // decrement-all; drop zeros (amortized O(1) per arrival overall)
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counters.mapValuesInPlace((_, c) => c - 1)
        counters.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(counters.remove)
    }
  }

  def mergeFrom(other: MgState): Unit = {
    n += other.n
    other.counters.foreach { case (i, c) =>
      counters.update(i, counters.getOrElse(i, 0L) + c)
    }
    if (counters.size > k) {
      val cut = counters.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counters.mapValuesInPlace((_, c) => c - cut)
      counters.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(counters.remove)
    }
  }
}

object MisraGriesAgg {
  /** Build from SQL-call args (`graft_heavy_hitters(item, k)`): k must
    * fold to a positive integral constant. Accepts any foldable integral
    * expression (literal, cast, arithmetic over literals) and fails with
    * a typed message otherwise — never a raw NumberFormatException.
    */
  def fromFunctionArgs(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): MisraGriesAgg = {
    if (es.size != 2) throw new IllegalArgumentException(
      s"graft_heavy_hitters expects 2 arguments (item, k), got ${es.size}")
    val kExpr = es(1)
    val k: Int = kExpr match {
      case e if e.foldable && e.dataType.isInstanceOf[IntegralType] =>
        e.eval() match {
          case null => throw new IllegalArgumentException(
            "graft_heavy_hitters k must not be NULL")
          case b: Byte => b.toInt
          case s: Short => s.toInt
          case i: Int => i
          case l: Long =>
            if (l < 1 || l > Int.MaxValue) throw new IllegalArgumentException(
              s"graft_heavy_hitters k out of range: $l")
            l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_heavy_hitters k folded to unexpected value $other")
        }
      case other => throw new IllegalArgumentException(
        "graft_heavy_hitters k must be a constant integer " +
          s"(got ${other.dataType.simpleString} expression: ${other.sql})")
    }
    if (k < 1) throw new IllegalArgumentException(
      s"graft_heavy_hitters k must be >= 1, got $k")
    MisraGriesAgg(es.head, k)
  }
}

case class MisraGriesAgg(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(itemExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  // struct(n_total, array<struct<item, count_lb>> sorted by item)
  override def dataType: DataType = new StructType()
    .add("n_total", LongType)
    .add("candidates", ArrayType(new StructType()
      .add("item", StringType).add("count_lb", LongType), containsNull = false))
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): MgState = new MgState(k)

  override def update(buf: MgState, input: InternalRow): MgState = {
    val v = itemExpr.eval(input)
    // NULL rows count toward n_total (so n_total == count(*), the
    // denominator an oracle computes) but never enter the counters.
    // The superset guarantee is preserved: decrements only happen on
    // non-null arrivals, so error <= n_nonnull/(k+1) <= n_total/(k+1).
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    else buf.n += 1
    buf
  }

  override def merge(buf: MgState, other: MgState): MgState = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgState): Any = {
    val rows: Array[Any] = buf.counters.toArray.sortBy(_._1).map {
      case (i, c) => InternalRow(UTF8String.fromString(i), c): Any
    }
    InternalRow(buf.n, new GenericArrayData(rows))
  }

  override def serialize(buf: MgState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counters.size)
    // explicit length + raw UTF-8 bytes: writeUTF caps items at 65535
    // encoded bytes and would throw at shuffle time on longer strings
    buf.counters.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new MgState(k)
    st.n = in.readLong()
    val m = in.readInt()
    var j = 0
    while (j < m) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val item = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      st.counters.update(item, in.readLong())
      j += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MisraGriesAgg =
    copy(itemExpr = cs(0))
}
