package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** O(k) MERGE of KMV/Theta sketch COLUMNS: each input row is already a
  * sketch (`array<bigint>` of k-smallest distinct hashes, the
  * [[KmvSketchAgg]] output), and the aggregate unions them keeping the
  * k smallest distinct values — WITHOUT exploding cells × k rows back
  * through a re-sketch (the shape rel_sketch_cube/rel_sketch_roundtrip
  * used before this existed). Because a KMV sketch is a complete
  * distinct sample below its θ, merge + re-truncate is LOSSLESS: the
  * result is bit-identical to sketching the concatenated raw streams,
  * so consumers (estimates, set ops, the oracle) cannot tell the
  * difference — only the plan changes, from O(cells × k) exchanged
  * rows to O(cells) sketch rows with k longs each, combined map-side.
  *
  * Distributed shape: `update` folds one input sketch into the k-capped
  * tree (O(k log k) worst case, early-outs below the current θ),
  * `merge` is the same bounded union between partials — partial
  * aggregation ships at most k longs per partition per group. Input
  * arrays need not be sorted or deduplicated (the tree set dedups);
  * null rows and null sketches contribute nothing.
  */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_merge"

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def insert(buf: JTreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); return }
    if (v < buf.last() && buf.add(v)) buf.pollLast()
  }

  override def update(buf: JTreeSet[java.lang.Long], input: InternalRow)
  : JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { insert(buf, arr.getLong(i)); i += 1 }
    }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = newChildren.head)
}
