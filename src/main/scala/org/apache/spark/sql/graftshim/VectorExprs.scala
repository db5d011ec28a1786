package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (zip_with/aggregate) are interpreted —
  * each element evaluation goes through a lambda-variable indirection and
  * boxes — which is fine for the long tail but not for a dot product
  * executed O(corpus × queries) times. These expressions generate a tight
  * primitive loop inside whole-stage codegen instead.
  *
  * Accumulation is a sequential index-order double fold — bit-identical
  * to the Ops.dot HOF formulation and to the DuckDB oracle's per-index
  * sum, so swapping them can never change results.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector — same codegen treatment. */
case class FloatVectorNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVectorNorm =
    copy(child = newChild)
}

/** Ranks the rows of a fixed codebook matrix by dot product with the
  * input vector: returns `array<int>` of row ids ordered by
  * (dot desc, id asc). One expression replaces numRows× replicated
  * dot-product subtrees (each with its own 64-float literal), which
  * bloated analysis time and generated-code size linearly in the number
  * of cells. The matrix rides along as a plan-bound reference object —
  * shipped once per executor, like a broadcast.
  *
  * Used for IVF coarse quantization: element 1 is the home cell
  * (argmax), a prefix slice is the probe list. Ties break toward the
  * smaller row id — identical to the previous
  * greatest/array_sort(struct(s, -id, id)) formulation.
  */
case class FloatMatrixDotRank(
    child: Expression, matSeq: scala.collection.immutable.ArraySeq[Float], dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0 && matSeq.length % dim == 0, "matrix must be numRows x dim")

  // the case-class field is an immutable ArraySeq so equals/hashCode are
  // content-based (canonicalization / semanticEquals / CSE can dedup two
  // structurally identical instances); the hot loop runs on a raw array
  @transient private lazy val mat: Array[Float] = matSeq.toArray

  private val numRows: Int = matSeq.length / dim

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_matrix_dot_rank"

  /** Dots then a stable insertion sort on (dot desc, id asc); numRows is
    * small (a codebook), so O(R^2) beats allocating comparator boxes.
    */
  private def rank(dots: Array[Double]): Array[Int] = {
    val ids = Array.tabulate(numRows)(identity)
    var i = 1
    while (i < numRows) {
      val id = ids(i)
      val d = dots(id)
      var j = i - 1
      while (j >= 0 && (dots(ids(j)) < d || (dots(ids(j)) == d && ids(j) > id))) {
        ids(j + 1) = ids(j); j -= 1
      }
      ids(j + 1) = id
      i += 1
    }
    ids
  }

  private def dots(x: ArrayData): Array[Double] = {
    val n = math.min(x.numElements(), dim)
    val out = new Array[Double](numRows)
    var r = 0
    while (r < numRows) {
      var acc = 0.0
      var i = 0
      val base = r * dim
      while (i < n) { acc += x.getFloat(i).toDouble * mat(base + i).toDouble; i += 1 }
      out(r) = acc
      r += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(rank(dots(a.asInstanceOf[ArrayData])))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("graftMatRank", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): FloatMatrixDotRank =
    copy(child = newChild)
}

/** Sign-LSH bucket: bit j of the result is set iff dot(input, plane j)
  * >= 0. Same single-pass, plan-bound-matrix treatment as
  * FloatMatrixDotRank — replaces numPlanes× (dot >= 0 → 1<<j) OR-chains.
  */
case class FloatMatrixSignBucket(
    child: Expression, planesSeq: scala.collection.immutable.ArraySeq[Float], dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0 && planesSeq.length % dim == 0, "planes must be numPlanes x dim")
  require(planesSeq.length / dim <= 63, "bucket bits must fit a long")

  // content-based equality field + raw-array hot loop (see FloatMatrixDotRank)
  @transient private lazy val planes: Array[Float] = planesSeq.toArray

  private val numPlanes: Int = planesSeq.length / dim

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_bucket"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var bucket = 0L
    var j = 0
    while (j < numPlanes) {
      var acc = 0.0
      var i = 0
      val base = j * dim
      while (i < n) { acc += x.getFloat(i).toDouble * planes(base + i).toDouble; i += 1 }
      if (acc >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("graftSignBucket", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (Long) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): FloatMatrixSignBucket =
    copy(child = newChild)
}

/** Hamming distance between two 64-bit signatures (SimHash pairing). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

