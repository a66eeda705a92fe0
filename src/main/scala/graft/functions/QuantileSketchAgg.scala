package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared machinery of the deterministic mergeable QUANTILE SKETCH —
  * the rank-error-bounded summary serving KLL's role with a compaction
  * both engines can replay bit-for-bit.
  *
  * MECHANISM (level sampling with md5 coins): every row carries a
  * 60-bit md5-derived hash of its unique row id; the row's LEVEL is
  * the hash's trailing-zero count (a geometric coin that is a pure
  * function of the row, not of arrival order or buffer state). The
  * sketch at capacity c retains exactly the rows with level >= L for
  * the MINIMAL L such that at most c rows qualify — a well-defined
  * function of the data alone. Retained rows are each a uniform
  * 2^-L-probability sample, so est_rank(v) = 2^L * |{retained <= v}|
  * and the q-quantile read is the retained value at rank ceil(q*m).
  *
  * WHY NOT TEXTBOOK KLL: classic KLL compacts a full buffer by keeping
  * random odd/even positions — the surviving set depends on arrival
  * order and coin flips, which a SQL oracle cannot replay. Hash-level
  * sampling makes the retained set ORDER-INSENSITIVE and deterministic
  * (the md5 coins are the "seed"), at the price of a weaker rank-error
  * bound: O(sqrt(q(1-q)/m)) with m retained rows (~4% at m=256,
  * independent of n) versus KLL's ~O(1/m). That trade is deliberate:
  * the oracle gate needs reproducible CONTENTS, and capacity is the
  * accuracy knob (QuantileSketchSpec pins the measured curve: max grid
  * error 3.8% / 3.3% / 1.0% at cap 256 / 1024 / 4096; the
  * rel_qsketch_cap_curve query serves the same table oracle-checked).
  *
  * THE O(1/m) ROUTE WAS EXAMINED AND REJECTED (r14 verdict stretch
  * goal): KLL's 1/m bound comes from RANK-ALTERNATING compaction —
  * keeping every other element in sorted order makes adjacent survival
  * errors cancel instead of accumulating like independent coins. A
  * deterministic, order-insensitive version exists (keep odd SORTED
  * RANKS within the level — a pure function of the set, perfectly SQL-
  * replayable), but it is NOT losslessly mergeable: rank parity is
  * relative to the containing multiset, so parity(A ∪ B) cannot be
  * derived from parity(A) and parity(B) — two partials retain rows the
  * union's sketch must drop and vice versa, and the partials-store /
  * exactly-once-handoff / mapGroupsWithState paths (which all lean on
  * merge == from-scratch bit-equality) would silently diverge from the
  * batch oracle. Per-row hash coins are the unique point where
  * determinism, order-insensitivity, AND lossless merge meet; the
  * sqrt(1/m) error is the price of that intersection, and the cap
  * curve above is the documented compensation.
  *
  * LOSSLESS MERGE IDENTITY (same discipline as the KMV family): for
  * partials A, B with minimal levels LA, LB and the union's minimal
  * level L*, L* >= max(LA, LB) — the union has at least each part's
  * rows at any level — so every row of the union's sketch is present
  * in A's or B's retained set; merge = union the pairs, re-raise to
  * the minimal level. The merged sketch is bit-identical to the
  * from-scratch sketch of the concatenated data, which is what lets a
  * partials store serve any slice without rescanning and lets the
  * oracle check merged contents against the raw definition.
  *
  * WIRE FORMAT (eval output): array<bigint>
  * [L, h1, v1, h2, v2, ...] with pairs sorted by (h, v) — canonical,
  * exact-integer, hashable by the driver once stringified.
  * Distributed shape: update keeps <= c pairs per partition, merge
  * ships <= c pairs per group — map-side combine, never the row
  * stream.
  */
private[graft] object QSketch {

  /** levels above 60 cannot occur for 60-bit hashes; h=0 parks at 60
    * (the oracle uses the same convention) */
  def levelOf(h: Long): Int =
    math.min(java.lang.Long.numberOfTrailingZeros(h), 60)

  final class Buf(var level: Int,
                  val pairs: scala.collection.mutable.ArrayBuffer[(Long, Long)])

  def empty: Buf = new Buf(0, scala.collection.mutable.ArrayBuffer.empty)

  def insert(buf: Buf, h: Long, v: Long, cap: Int): Unit = {
    if (levelOf(h) >= buf.level) {
      buf.pairs += ((h, v))
      shrink(buf, cap)
    }
  }

  def shrink(buf: Buf, cap: Int): Unit =
    while (buf.pairs.size > cap) {
      buf.level += 1
      buf.pairs.filterInPlace { case (h, _) => levelOf(h) >= buf.level }
    }

  def merge(b1: Buf, b2: Buf, cap: Int): Buf = {
    if (b2.level > b1.level) {
      b1.level = b2.level
      b1.pairs.filterInPlace { case (h, _) => levelOf(h) >= b1.level }
    }
    b2.pairs.foreach { case (h, v) =>
      if (levelOf(h) >= b1.level) b1.pairs += ((h, v))
    }
    shrink(b1, cap)
    b1
  }

  def eval(buf: Buf): GenericArrayData = {
    val sorted = buf.pairs.sortBy(identity)
    val out = new Array[Long](1 + 2 * sorted.size)
    out(0) = buf.level.toLong
    var i = 0
    sorted.foreach { case (h, v) =>
      out(1 + 2 * i) = h; out(2 + 2 * i) = v; i += 1
    }
    new GenericArrayData(out)
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.level)
    out.writeInt(buf.pairs.size)
    buf.pairs.foreach { case (h, v) => out.writeLong(h); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val level = in.readInt()
    val n = in.readInt()
    val pairs = new scala.collection.mutable.ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { pairs += ((in.readLong(), in.readLong())); i += 1 }
    new Buf(level, pairs)
  }
}

/** Build the quantile sketch from (rowHash, value) columns — see
  * [[QSketch]] for semantics and wire format. `hash` must be the
  * 60-bit md5 hash of a UNIQUE row id (the determinism seed); `value`
  * is the measure the quantiles are over (exact integers — cents,
  * micros — so the oracle compares bit-for-bit). */
case class QuantileSketchAgg(
    hash: Expression,
    value: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch.Buf] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_qsketch"

  override def createAggregationBuffer(): QSketch.Buf = QSketch.empty

  override def update(buf: QSketch.Buf, input: InternalRow): QSketch.Buf = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      QSketch.insert(buf, h.asInstanceOf[Long], v.asInstanceOf[Long],
        capacity)
    buf
  }

  override def merge(b1: QSketch.Buf, b2: QSketch.Buf): QSketch.Buf =
    QSketch.merge(b1, b2, capacity)

  override def eval(buf: QSketch.Buf): Any = QSketch.eval(buf)

  override def serialize(buf: QSketch.Buf): Array[Byte] =
    QSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketch.Buf =
    QSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int)
  : QuantileSketchAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
  : QuantileSketchAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(hash = newChildren(0), value = newChildren(1))
}

/** Merge already-built quantile-sketch COLUMNS (the [[QSketch]] wire
  * format) in O(capacity) per input — the partials-store read path.
  * Lossless: the merged sketch is bit-identical to building one sketch
  * over the concatenated raw data (see [[QSketch]]'s merge identity).
  */
case class QuantileSketchMergeAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketch.Buf] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_qsketch_merge"

  override def createAggregationBuffer(): QSketch.Buf = QSketch.empty

  override def update(buf: QSketch.Buf, input: InternalRow): QSketch.Buf = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      require(n % 2 == 1,
        s"graft_qsketch_merge expects [level, (h,v)*] pairs, got $n longs")
      val declaredLevel = arr.getLong(0).toInt
      val other = new QSketch.Buf(declaredLevel,
        scala.collection.mutable.ArrayBuffer.empty)
      var i = 1
      while (i < n) {
        val h = arr.getLong(i)
        // a pair below the declared level cannot come from a canonical
        // minimal-level sketch — a corrupted or hand-built input would
        // otherwise silently break the lossless-merge identity (the
        // merged result would no longer equal the from-scratch sketch)
        require(QSketch.levelOf(h) >= declaredLevel,
          s"graft_qsketch_merge: pair hash $h has level " +
            s"${QSketch.levelOf(h)} < declared level $declaredLevel — " +
            "not a canonical minimal-level sketch")
        other.pairs += ((h, arr.getLong(i + 1))); i += 2
      }
      QSketch.merge(buf, other, capacity)
    }
    buf
  }

  override def merge(b1: QSketch.Buf, b2: QSketch.Buf): QSketch.Buf =
    QSketch.merge(b1, b2, capacity)

  override def eval(buf: QSketch.Buf): Any = QSketch.eval(buf)

  override def serialize(buf: QSketch.Buf): Array[Byte] =
    QSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QSketch.Buf =
    QSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int)
  : QuantileSketchMergeAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
  : QuantileSketchMergeAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchMergeAgg =
    copy(child = newChildren.head)
}
