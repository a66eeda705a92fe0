package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Second-moment sums of a vector column (`array<float|double>`) as one
  * typed imperative aggregate — the covariance/PCA "train" primitive.
  *
  * Accumulates, in a single pass over the original rows, everything the
  * d×d covariance matrix needs: the vector count n, the per-dimension
  * sums Σxᵢ, and the upper-triangular outer-product sums Σxᵢxⱼ (i ≤ j;
  * the matrix is symmetric, so the triangle is the whole model). The
  * declarative formulation — self-join the posexploded elements on
  * vec_id then aggregate per (i, j) — amplifies every 64-dim vector into
  * 64·65/2 = 2080 join rows BEFORE partial aggregation; this operator
  * keeps the amplification inside a per-partition mutable buffer, so the
  * shuffle carries one (1 + d + d(d+1)/2)-double buffer per (partition,
  * group) — ~17 KB at d = 64 — regardless of row count. At 100 TB the
  * exchange moves kilobytes per map task instead of 2080× the row count.
  *
  * Output layout (one flat `array<double>`, model-sized): [n, s₀…s_{d−1},
  * o₀₀, o₀₁…o₀,d−1, o₁₁…o_{d−1,d−1}] — count, element sums, then the
  * upper triangle in row-major order. Callers derive population
  * covariance as Cᵢⱼ = oᵢⱼ/n − (sᵢ/n)(sⱼ/n). Same merge-order caveat as
  * [[VectorMeanAgg]]: partition merge order is engine-scheduled, so
  * cross-engine consumers round the derived statistics.
  *
  * Reference analogue: none (the reference has no linear algebra);
  * engine extension alongside [[VectorMeanAgg]] (`Similarity.centroids`).
  */
case class VectorOuterSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorOuterSumAgg.Buffer] {

  import VectorOuterSumAgg.Buffer

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_outer_sum"

  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_outer_sum expects array<float|double>, got $other")
    }

  override def createAggregationBuffer(): Buffer = new Buffer(-1, null, null, 0L)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buf.dims < 0) {
        buf.dims = d
        buf.sums = new Array[Double](d)
        buf.outer = new Array[Double](d * (d + 1) / 2)
      } else if (buf.dims != d)
        throw new IllegalArgumentException(
          s"graft_vec_outer_sum: vector length mismatch ${buf.dims} vs $d")
      val x = new Array[Double](d)
      var i = 0
      if (elemType == FloatType) {
        while (i < d) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      } else {
        while (i < d) { x(i) = arr.getDouble(i); i += 1 }
      }
      val s = buf.sums
      val o = buf.outer
      var k = 0
      i = 0
      while (i < d) {
        s(i) += x(i)
        val xi = x(i)
        var j = i
        while (j < d) { o(k) += xi * x(j); j += 1; k += 1 }
        i += 1
      }
      buf.n += 1L
    }
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    if (b2.dims < 0) return b1
    if (b1.dims < 0) {
      b1.dims = b2.dims; b1.sums = b2.sums; b1.outer = b2.outer
      b1.n = b2.n
      return b1
    }
    if (b1.dims != b2.dims)
      throw new IllegalArgumentException(
        s"graft_vec_outer_sum: vector length mismatch ${b1.dims} vs " +
          s"${b2.dims}")
    var i = 0
    while (i < b1.sums.length) { b1.sums(i) += b2.sums(i); i += 1 }
    i = 0
    while (i < b1.outer.length) { b1.outer(i) += b2.outer(i); i += 1 }
    b1.n += b2.n
    b1
  }

  override def eval(buf: Buffer): Any = {
    if (buf.dims < 0) return null
    val out = new Array[Any](1 + buf.sums.length + buf.outer.length)
    out(0) = buf.n.toDouble
    var i = 0
    while (i < buf.sums.length) { out(1 + i) = buf.sums(i); i += 1 }
    i = 0
    while (i < buf.outer.length) {
      out(1 + buf.sums.length + i) = buf.outer(i); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dims)
    if (buf.dims >= 0) {
      out.writeLong(buf.n)
      var i = 0
      while (i < buf.sums.length) { out.writeDouble(buf.sums(i)); i += 1 }
      i = 0
      while (i < buf.outer.length) { out.writeDouble(buf.outer(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dims = in.readInt()
    if (dims < 0) new Buffer(-1, null, null, 0L)
    else {
      val n = in.readLong()
      val s = new Array[Double](dims)
      var i = 0
      while (i < dims) { s(i) = in.readDouble(); i += 1 }
      val o = new Array[Double](dims * (dims + 1) / 2)
      i = 0
      while (i < o.length) { o(i) = in.readDouble(); i += 1 }
      new Buffer(dims, s, o, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorOuterSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorOuterSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorOuterSumAgg =
    copy(child = newChildren.head)
}

object VectorOuterSumAgg {
  /** Running sums; `dims == -1` until the first non-null input fixes the
    * dimensionality. `outer` stores the upper triangle row-major. */
  final class Buffer(var dims: Int, var sums: Array[Double],
                     var outer: Array[Double], var n: Long)
}
