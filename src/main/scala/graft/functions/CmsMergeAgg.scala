package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.CountMinSketch

/** Merge of serialized count-min sketches (the bytes Spark's built-in
  * `count_min_sketch` aggregate emits) into one sketch — the
  * RE-AGGREGATION half of the incremental-sketch pattern.
  *
  * At 100 TB nobody rebuilds a sketch over all history per query: each
  * day/partition materializes its own ~11 KB sketch once, and queries
  * merge the stored sketches (element-wise counter adds, exact — a merged
  * CMS is bit-identical to one built over the concatenated data, given
  * identical eps/confidence/seed). This aggregate makes that merge a
  * one-liner over a sketch column; mismatched sketch shapes fail loudly
  * (`IncompatibleMergeException`) rather than blending wrong counters.
  *
  * Shuffle carries one sketch per partial, never row data.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsMergeAgg.Buffer] {

  import CmsMergeAgg.Buffer

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_merge"

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms_merge expects a serialized sketch (binary), got $other")
    }

  override def createAggregationBuffer(): Buffer = new Buffer(null)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val sk = CountMinSketch.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      if (buf.sk == null) buf.sk = sk else buf.sk.mergeInPlace(sk)
    }
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    if (b2.sk == null) return b1
    if (b1.sk == null) { b1.sk = b2.sk; return b1 }
    b1.sk.mergeInPlace(b2.sk)
    b1
  }

  override def eval(buf: Buffer): Any = {
    if (buf.sk == null) return null
    val bos = new ByteArrayOutputStream()
    buf.sk.writeTo(bos)
    bos.toByteArray
  }

  override def serialize(buf: Buffer): Array[Byte] =
    if (buf.sk == null) Array.emptyByteArray
    else eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Buffer =
    if (bytes.isEmpty) new Buffer(null)
    else new Buffer(CountMinSketch.readFrom(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}

object CmsMergeAgg {
  /** Mutable merge state: the running sketch (null until first input). */
  final class Buffer(var sk: CountMinSketch)
}
