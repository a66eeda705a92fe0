package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV / Theta-sketch retention aggregate: the k smallest DISTINCT hash
  * values of the input column, as a sorted-ascending `array<bigint>`.
  *
  * This is the bounded-state primitive of the Theta-sketch set-operation
  * family (Dasgupta et al., "Theta-Sketch Framework", and the classic
  * KMV estimator of Bar-Yossef et al.): with hashes uniform on
  * [0, 2^60), the k-th smallest retained value θ estimates the distinct
  * count as (k-1)·2^60/θ, and because the retained set is a COMPLETE
  * distinct sample below θ, sketches support union (merge + re-truncate,
  * losslessly equal to the sketch of the concatenated data),
  * intersection, and difference estimates without rescanning — the
  * partials a 100 TB pipeline materializes per segment and combines in
  * O(k) per pair.
  *
  * Distributed shape: `update` keeps at most k values per partition
  * (O(log k) probe + O(k) worst-case insert against a k-capped tree),
  * `merge` is a bounded set union — map-side partial aggregation ships
  * at most k longs per partition per group, never the key stream. The
  * result is deterministic for any input order (a set of smallest
  * values has no tie ambiguity: values are distinct by construction).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_sketch"

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def insert(buf: JTreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); return }
    // full: only a value below the current k-th smallest displaces it
    if (v < buf.last() && buf.add(v)) buf.pollLast()
  }

  override def update(buf: JTreeSet[java.lang.Long], input: InternalRow)
  : JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: JTreeSet[java.lang.Long],
                     b2: JTreeSet[java.lang.Long])
  : JTreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
