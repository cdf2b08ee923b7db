package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector SUM aggregate — the custom-aggregate face of the
  * engine (TypedImperativeAggregate with a primitive mutable buffer),
  * complementing the scalar codegen kernels in VecExpressions.
  *
  * `sum(array<float|double>) -> array<double>`: one double[] buffer per
  * group, updated in place per input row and vector-added on partial
  * merge — so a per-label centroid over 100 TB of embeddings shuffles
  * ONE dim-length array per (group, map partition) instead of
  * `dim` separate avg() aggregate states (the composable alternative,
  * 64 independent AVG columns, carries 64 (sum,count) pairs and plans
  * 64 aggregate expressions).
  *
  * Numerics: per-element double accumulation; partial-merge order
  * matches builtin sum/avg (tree merge), so downstream consumers use
  * the same rounding discipline (round4eps) as any averaged double.
  * Null array rows are skipped; element counts MUST agree (dense
  * embeddings) — a length mismatch throws rather than silently
  * truncating, because truncation would make the sum depend on which
  * row a partition happened to see first (nondeterministic results).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val arr = child.eval(input)
    if (arr == null) return buf
    val a = arr.asInstanceOf[ArrayData]
    val b = if (buf.isEmpty) new Array[Double](a.numElements()) else buf
    if (a.numElements() != b.length)
      throw new IllegalArgumentException(
        s"vec_sum: ragged input — row has ${a.numElements()} elements, " +
        s"group buffer has ${b.length}")
    val n = b.length
    var i = 0
    elemType match {
      case FloatType => while (i < n) { b(i) += a.getFloat(i); i += 1 }
      case _         => while (i < n) { b(i) += a.getDouble(i); i += 1 }
    }
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    if (b1.length != b2.length)
      throw new IllegalArgumentException(
        s"vec_sum: ragged partials — ${b1.length} vs ${b2.length} elements")
    var i = 0
    val n = b1.length
    while (i < n) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "vec_sum"
}
