package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise mean of a vector column (`array<float|double>`) as a typed
  * imperative aggregate — the IVF "train" primitive.
  *
  * The declarative formulation (`posexplode` then `avg` per `(group, pos)`)
  * amplifies every 64-dim vector into 64 shuffle rows BEFORE partial
  * aggregation sees them; this operator accumulates one running
  * `sum: Array[Double]` + count per group on the map side, so the shuffle
  * carries one (dims+1)-value buffer per (partition, group) — the same
  * partial+final shape as `TokenCountsAgg`, with zero row amplification.
  * At 100 TB the exchange moves `groups * dims * 8` bytes per map task
  * instead of `rows * dims` rows.
  *
  * Mutable-buffer accumulation is sequential within a partition; partition
  * merge order is engine-scheduled, so cross-engine users should `round`
  * the means (exactly like the `avg` it replaces — Spark's own partial
  * `avg` has the same property).
  */
case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanAgg.Buffer] {

  import VectorMeanAgg.Buffer

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_mean"

  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_mean expects array<float|double>, got $other")
    }

  override def createAggregationBuffer(): Buffer = new Buffer(null, 0L)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sum == null) buf.sum = new Array[Double](n)
      else if (buf.sum.length != n)
        throw new IllegalArgumentException(
          s"graft_vec_mean: vector length mismatch ${buf.sum.length} vs $n")
      val s = buf.sum
      var i = 0
      if (elemType == FloatType) {
        while (i < n) { s(i) += arr.getFloat(i).toDouble; i += 1 }
      } else {
        while (i < n) { s(i) += arr.getDouble(i); i += 1 }
      }
      buf.n += 1L
    }
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    if (b2.sum == null) return b1
    if (b1.sum == null) { b1.sum = b2.sum; b1.n = b2.n; return b1 }
    if (b1.sum.length != b2.sum.length)
      throw new IllegalArgumentException(
        s"graft_vec_mean: vector length mismatch ${b1.sum.length} vs " +
          s"${b2.sum.length}")
    var i = 0
    while (i < b1.sum.length) { b1.sum(i) += b2.sum(i); i += 1 }
    b1.n += b2.n
    b1
  }

  override def eval(buf: Buffer): Any = {
    if (buf.sum == null) return null
    val out = new Array[Any](buf.sum.length)
    var i = 0
    while (i < buf.sum.length) { out(i) = buf.sum(i) / buf.n; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.sum == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sum.length)
      out.writeLong(buf.n)
      var i = 0
      while (i < buf.sum.length) { out.writeDouble(buf.sum(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dims = in.readInt()
    if (dims < 0) new Buffer(null, 0L)
    else {
      val n = in.readLong()
      val s = new Array[Double](dims)
      var i = 0
      while (i < dims) { s(i) = in.readDouble(); i += 1 }
      new Buffer(s, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMeanAgg =
    copy(child = newChildren.head)
}

object VectorMeanAgg {
  /** Running element-wise sum + vector count; `sum == null` until the
    * first non-null input fixes the dimensionality. */
  final class Buffer(var sum: Array[Double], var n: Long)
}
